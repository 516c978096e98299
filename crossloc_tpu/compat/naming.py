"""Output-directory naming grammar — load-bearing config round-trip.

The reference encodes hyper-parameters into the output directory name
(`train_single_task.py:138-186`, `finetune_decoder_single_task.py:159-221`)
and later decodes them for evaluation (`read_mata_info`,
`test_single_task.py:224-256`); checkpoint-selection tooling regex-depends
on the same strings. Reproduced exactly.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


def train_output_name(
    scene: str,
    task: str,
    session: str = "",
    grayscale: bool = False,
    uncertainty: Optional[str] = None,
    fullsize: bool = False,
    epochs: int = 50,
    learning_rate: float = 2e-4,
    real_data_chunk: float = 1.0,
    sim_data_chunk: float = 1.0,
    real_data_domain: str = "in_place",
    real_only: bool = False,
    tiny: bool = False,
    network_in: Optional[str] = None,
    debug: bool = False,
    e2e: bool = False,
    bf16: bool = False,
) -> str:
    """`get_output_path` grammar of `train_single_task.py:138-186`.

    `e2e` and `bf16` extend the grammar (framework extensions): DSAC
    end-to-end pose-loss training (`--e2e_pose_loss`) adds an "-e2e" token
    and bf16 mixed-precision training (`--bf16`) a "-bf16" token after the
    uncertainty token. `read_meta_info`'s substring decoding is unaffected;
    `utils/io.py::get_epoch_from_dirname` anchors the epoch token on its
    "-lr" suffix so neither token parses as an epoch.
    """
    name = f"{scene}-{task}"
    if session:
        name += "-s" + session
    if grayscale:
        name += "-gray"
    name += "-no_unc" if uncertainty is None else f"-unc-{uncertainty}"
    if e2e:
        name += "-e2e"
    if bf16:
        name += "-bf16"
    if fullsize:
        name += "-fullsize"
    lr_fmt = "-e{:d}-lr{:.4f}" if learning_rate >= 1e-4 else "-e{:d}-lr{:.6f}"
    name += lr_fmt.format(epochs, learning_rate)
    if real_data_chunk == 0.0:
        if sim_data_chunk <= 0:
            raise ValueError("one of real/sim chunks must be positive")
        name += "-sim_only" + "-sc{:.2f}".format(sim_data_chunk)
    else:
        name += "-real_only" if real_only else "-pairs"
        if real_data_domain == "in_place":
            name += "-ip"
        elif real_data_domain == "out_of_place":
            name += "-oop"
        else:
            raise NotImplementedError(real_data_domain)
        name += "-rc{:.2f}".format(real_data_chunk)
    if tiny:
        name += "-tiny"
    if network_in is not None:
        name += "-finetune"
    if debug:
        name += "-DEBUG"
    return name


def finetune_output_name(
    scene: str,
    task: str,
    encoders: Sequence[str],
    reuse_coord_encoder: bool = False,
    unfreeze_coord_encoder: bool = False,
    session: str = "",
    grayscale: bool = False,
    uncertainty: Optional[str] = None,
    fullsize: bool = False,
    epochs: int = 50,
    learning_rate: float = 1e-4,
    real_data_chunk: float = 1.0,
    sim_data_chunk: float = 0.0,
    real_data_domain: str = "in_place",
    real_only: bool = False,
    tiny: bool = False,
    network_in: Optional[str] = None,
    debug: bool = False,
    e2e: bool = False,
    bf16: bool = False,
) -> str:
    """`get_output_path` grammar of `finetune_decoder_single_task.py:159-221`.

    `e2e` and `bf16` extend the grammar like `train_output_name` (framework
    extensions); without the `-e2e` token a proxy finetune and an e2e finetune
    of the same config would collide in one output directory (and auto_resume
    would happily resume one from the other)."""
    name = f"{scene}-{task}"
    name += "-decoder_" + "_".join(encoders)
    if reuse_coord_encoder:
        name = name.replace(
            "_coord_", "_coord_free_" if unfreeze_coord_encoder else "_coord_frozen_"
        )
    else:
        name = name.replace("_coord_", "_")
    if session:
        name += "-s" + session
    if grayscale:
        name += "-gray"
    name += "-no_unc" if uncertainty is None else f"-unc-{uncertainty}"
    if e2e:
        name += "-e2e"
    if bf16:
        name += "-bf16"
    if fullsize:
        name += "-fullsize"
    lr_fmt = "-e{:d}-lr{:.4f}" if learning_rate >= 1e-4 else "-e{:d}-lr{:.6f}"
    name += lr_fmt.format(epochs, learning_rate)
    if real_data_chunk == 0.0:
        if sim_data_chunk <= 0:
            raise ValueError("one of real/sim chunks must be positive")
        name += "-zero_shot" if "-ft0.00" in session else "-sim_only"
        name += "-sc{:.2f}".format(sim_data_chunk)
    else:
        if sim_data_chunk != 0.0:
            raise ValueError("pairwise fine-tuning disables LHS sim data")
        name += "-real_only" if real_only else "-pairwise"
        if real_data_domain == "in_place":
            name += "-ip"
        elif real_data_domain == "out_of_place":
            name += "-oop"
        else:
            raise NotImplementedError(real_data_domain)
        name += "-rc{:.2f}".format(real_data_chunk)
    if tiny:
        name += "-tiny"
    if network_in is not None:
        name += "-resume"
    if debug:
        name += "-DEBUG"
    return name


def read_meta_info(folder_name: str) -> Tuple[str, bool, str, List[str], bool, bool, Optional[str]]:
    """Decode (scene, grayscale, task, sections, tiny, fullsize, uncertainty)
    from an output folder name (`test_single_task.py:224-256`)."""
    if "no_unc" in folder_name:
        uncertainty = None
    elif "unc-MLE" in folder_name:
        uncertainty = "MLE"
    else:
        raise NotImplementedError("unknown uncertainty keyword in " + folder_name)

    scene = folder_name.split("-")[0]
    grayscale = "-gray" in folder_name
    task = folder_name.split("-")[1]

    if "decoder" in folder_name:
        if "-oop-" in folder_name:
            section = ["test_oop_drone_real"]
        elif "-ip-" in folder_name:
            section = ["test_drone_real"]
        else:
            raise NotImplementedError("unknown domain keyword in " + folder_name)
    else:
        section = ["val_drone_sim", "val_drone_real"]

    tiny = "-tiny" in folder_name
    fullsize = "-fullsize" in folder_name or "-semantics" in folder_name
    return scene, grayscale, task, section, tiny, fullsize, uncertainty
