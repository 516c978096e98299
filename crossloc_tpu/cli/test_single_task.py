"""Evaluate trained weights: pose via the fused net+RANSAC program, plus
depth / normal / semantics metrics.

Arg-compatible with the reference `test_single_task.py` (`:18-115`), with
the same weight-discovery rules (`:118-221`), folder-name metadata decoding
(`read_mata_info`, `:224-256`), per-section loop and results text formats.

TPU-native differences: evaluation is batched (the reference pose solver is
batch=1 only, `dsacstar.cpp:52`), and image->pose runs as ONE jit program
instead of GPU-net -> host copy -> C++ plugin. Like the reference, eval
images are the raw resized RGB tensors (`utils/evaluation.py:70-72`,
raw_image=True — no normalization).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from .. import compat, eval as evaluation, models, ransac
from ..data import CamLocDataset, Loader
from ..losses import get_nodata_value
from . import common


def config_parser():
    parser = argparse.ArgumentParser(
        description="Evaluate a scene coordinate regression network.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("scene", nargs="?", default=None)
    parser.add_argument("--grayscale", "-grayscale", action="store_true")
    parser.add_argument("--task", type=str, default=None)
    parser.add_argument("--section", type=str, nargs="+", default=["val_drone_sim", "val_drone_real"])
    parser.add_argument("--network_in", type=str, default=None)
    parser.add_argument("--tiny", "-tiny", action="store_true")
    parser.add_argument("--fullsize", "-fullsize", action="store_true")
    parser.add_argument("--session", "-sid", default="")
    parser.add_argument("--search_dir", action="store_true")
    parser.add_argument("--min_ckpt_iter", default=None, type=float)
    parser.add_argument("--max_ckpt_iter", default=None, type=float)
    parser.add_argument("--keywords", default=None, nargs="+")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--save_pred", action="store_true")
    parser.add_argument("--hypotheses", "-hyps", type=int, default=64)
    parser.add_argument("--threshold", "-t", type=float, default=10)
    parser.add_argument("--inlieralpha", "-ia", type=float, default=100)
    parser.add_argument("--maxpixelerror", "-maxerrr", type=float, default=100)
    parser.add_argument("--uncertainty", "-uncertainty", default=None, type=str)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="eval batch size (framework extension; reference is 1)")
    parser.add_argument("--datasets_dir", type=str, default="./datasets")
    parser.add_argument("--image_height", type=int, default=480,
                        help="standard input image height (framework extension)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 conv compute for the network forward "
                             "(framework extension; the pose solver keeps "
                             "full f32). Matches the bench.py configuration.")
    parser.add_argument("--num_devices", type=int, default=1,
                        help="data-parallel evaluation over a device mesh "
                             "(framework extension; batches are padded to a "
                             "multiple of this and sharded on the batch axis)")
    parser.add_argument("--ransac_cfg", type=str, default="{}",
                        help="RansacConfig field overrides as JSON, e.g. "
                             "'{\"refine_top_k\": 4, \"eval_selection\": "
                             "\"hard\"}' — reproduces the measured-but-"
                             "defaulted-off solver experiments without code "
                             "edits (framework extension; same contract as "
                             "tools/plugin_ab.py --cfg). Applied on top of "
                             "the flag-derived config.")
    return parser


def config_weight_path(
    network_in: Union[str, list],
    keywords=None,
    search_dir: bool = False,
    min_ckpt_iter: Optional[float] = None,
    max_ckpt_iter: Optional[float] = None,
) -> List[str]:
    """Weight discovery rules of `test_single_task.py:118-221` — including
    the reference quirk that setting min/max_ckpt_iter drops `model.net`
    (only `ckpt_iter_*` files carry an iteration number)."""
    if isinstance(network_in, list):
        paths_in = sorted(os.path.abspath(p) for p in network_in)
    else:
        paths_in = [os.path.abspath(network_in)]

    if search_dir:
        assert len(paths_in) == 1 and os.path.isdir(paths_in[0])
        src = paths_in[0]
        paths_in = [os.path.join(src, d) for d in os.listdir(src)]

    network_paths: List[str] = []
    for path in paths_in:
        if not os.path.exists(path):
            raise FileNotFoundError(f"Network input path {path} is not found.")
        if os.path.isdir(path):
            model_path = os.path.join(path, "model.net")
            if os.path.exists(model_path):
                network_paths.append(model_path)
            network_paths += glob.glob(os.path.join(path, "ckpt_iter*.net"))
        elif os.path.isfile(path):
            base = os.path.basename(path)
            if (base.startswith("model") or "ckpt_" in base) and base.endswith(".net"):
                network_paths.append(path)

    if keywords is not None:
        if isinstance(keywords, str):
            keywords = [keywords]
        network_paths = sorted(
            {p for p in network_paths if all(k in os.path.dirname(p) for k in keywords)}
        )

    def _iter_of(p):
        return int(os.path.basename(p).split("_")[-1].replace(".net", ""))

    if min_ckpt_iter is not None:
        network_paths = [
            p for p in network_paths
            if "ckpt_iter_" in os.path.basename(p) and _iter_of(p) > min_ckpt_iter
        ]
    if max_ckpt_iter is not None:
        network_paths = [
            p for p in network_paths
            if "ckpt_iter_" in os.path.basename(p) and _iter_of(p) < max_ckpt_iter
        ]
    network_paths.sort()
    for idx, path in enumerate(network_paths):
        print("Network weight #{:d}: {:s}".format(idx, path))
    return network_paths


def resolve_eval_roots(scene: str, section_keyword: str, datasets_dir: str = "./datasets"):
    """Evaluation section resolution incl. the special aggregate keywords
    (`utils/evaluation.py:36-62`)."""
    direct = os.path.join(datasets_dir, scene, section_keyword)
    if os.path.exists(direct):
        return direct
    specials = {
        "test_real_all": ["val_drone_real", "test_drone_real"],
        "real_all": ["val_drone_real", "test_drone_real", "train_drone_real"],
        "test_sim_all": ["val_drone_sim", "val_sim", "test_drone_sim"],
        "sim_all": ["val_drone_sim", "val_sim", "test_drone_sim", "train_sim"],
    }
    if section_keyword not in specials:
        raise NotImplementedError(f"section {section_keyword} not found")
    return [os.path.join(datasets_dir, scene, s) for s in specials[section_keyword]]


def build_eval_loader(scene, task, grayscale, section, fullsize, batch_size, datasets_dir,
                      image_height=480):
    roots = resolve_eval_roots(scene, section, datasets_dir)
    ds = CamLocDataset(
        roots,
        coord=task == "coord",
        depth=task == "depth",
        normal=task == "normal",
        semantics=task == "semantics",
        grayscale=grayscale,
        raw_image=True,
        image_height=image_height,
    )
    return ds, Loader(ds, batch_size=batch_size, shuffle=False, drop_last=False)


def evaluate_network(opt, network_path: str, scene, grayscale, task, sections, tiny,
                     fullsize, uncertainty) -> str:
    """Evaluate one weight file over all sections; returns the log path."""
    common.select_device_from_env()
    common.enable_compilation_cache()
    nodata_value = get_nodata_value(scene)
    num_enc = common.infer_num_encoders(network_path)
    # space-to-depth stems: exact re-expression of the same params
    # (parity-tested), ~3% faster inference on TPU (BENCH_NOTES round 3).
    # --bf16 runs conv compute in bfloat16 (params/GN stats/outputs stay
    # f32; the solver keeps its full-f32 precision guard) — the bench.py
    # headline configuration, reachable from this CLI.
    model = common.build_network(
        scene, task, tiny, grayscale, uncertainty, fullsize,
        np.zeros(models.task_channels(task), np.float32), num_mlr=num_enc,
        stem_s2d=True,
        dtype=jnp.bfloat16 if getattr(opt, "bf16", False) else None,
    )
    params = compat.load_net(network_path, model)
    print("Successfully loaded %s." % network_path)

    # data-parallel eval (framework extension): shard the batch axis over a
    # 1-D device mesh; params replicate, XLA partitions the fused programs.
    # Tail batches are padded to a multiple of the mesh (results sliced off
    # host-side), so any dataset length works with any device count.
    ndev = max(1, int(getattr(opt, "num_devices", 1) or 1))
    if ndev > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from .. import parallel

        devices = jax.devices()[:ndev]
        if len(devices) < ndev:
            raise ValueError(f"requested {ndev} devices, found {len(devices)}")
        mesh = parallel.make_mesh(devices, data=ndev, spatial=1)
        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
        replicated = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, replicated)
        print("Data-parallel evaluation over %d devices" % ndev)

    def shard_batch(*arrays):
        """Pad leading dim to a multiple of the mesh and shard it. Returns
        (sharded arrays..., real batch size)."""
        n = int(arrays[0].shape[0])
        if ndev == 1:
            return (*arrays, n)
        pad = (-n) % ndev
        out = []
        for a in arrays:
            if pad:
                a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
            out.append(jax.device_put(a, batch_sharding))
        return (*out, n)

    cfg = ransac.RansacConfig(
        hypotheses=opt.hypotheses,
        inlier_threshold=opt.threshold,
        inlier_alpha=opt.inlieralpha,
        max_pixel_error=opt.maxpixelerror,
        subsample=1 if fullsize else 8,
    )
    overrides = json.loads(getattr(opt, "ransac_cfg", None) or "{}")
    if overrides:
        unknown = set(overrides) - set(cfg._fields)
        if unknown:
            raise ValueError(f"unknown RansacConfig fields in --ransac_cfg: {sorted(unknown)}")
        # coerce to each field's declared type: JSON yields floats/strings
        # where int/bool fields feed trace-time static shapes, and a float
        # `hypotheses` would fail deep inside jit with an opaque error
        for k, v in list(overrides.items()):
            want = type(getattr(cfg, k))
            if isinstance(v, want):
                continue
            if want is int and isinstance(v, float) and v != int(v):
                raise ValueError(f"--ransac_cfg {k}={v!r}: expected {want.__name__}")
            if want is bool or not isinstance(v, (int, float)):
                raise ValueError(f"--ransac_cfg {k}={v!r}: expected {want.__name__}")
            overrides[k] = want(v)
        cfg = cfg._replace(**overrides)
        print("RansacConfig overrides: %s" % overrides)
    ntc = model.num_task_channel

    @jax.jit
    def forward(params, images):
        preds = model.apply({"params": params}, images)
        return preds[..., :ntc], preds[..., ntc:]

    @jax.jit
    def solve(coords, focal, key, image_hw):
        return ransac.solve_batch(coords, focal, image_hw, key, cfg)

    testing_log = os.path.join(
        os.path.dirname(network_path),
        "results_{:s}_task_{:s}.txt".format(os.path.basename(network_path), task),
    )

    for this_section in sections:
        print("{:s} Evaluating over section {:s} {:s}".format("*" * 20, this_section, "*" * 20))
        eval_set, loader = build_eval_loader(
            scene, task, grayscale, this_section, fullsize, opt.batch_size, opt.datasets_dir,
            opt.image_height,
        )
        if opt.save_pred:
            pred_dir = os.path.abspath(os.path.join(
                network_path, "../{:s}_pred_{:s}_{:s}".format(
                    task, os.path.basename(network_path), this_section)))
            os.makedirs(pred_dir, exist_ok=True)

        t_err_ls, r_err_ls, est_xyz_ls, coords_error_ls = [], [], [], []
        depth_ar_ls, depth_rms_ls, normal_err_ls = [], [], []
        miou_ls, fwiou_ls, acc_ls = [], [], []
        file_name_ls = []

        key = jax.random.PRNGKey(2021)

        def dispatch(batch):
            """Device-side work only: enqueue the fused programs (jax
            dispatch is async) and return the result futures, so the host
            consumes the PREVIOUS batch's results while this one computes."""
            nonlocal key
            # uint8 wire format: 4x less host->device traffic, exact round
            # trip on the 1/255 pixel grid (data/pipeline.py images_to_wire)
            from ..data import images_from_wire, images_to_wire

            images = images_from_wire(jnp.asarray(images_to_wire(batch)["image"]))
            if grayscale:
                # the reference's raw_image eval path feeds 3-channel tensors
                # even to grayscale nets (would crash); convert instead
                from ..data import to_grayscale

                images = to_grayscale(images)
            labels = jnp.asarray(
                batch["semantics"][..., None].astype(np.float32)
                if task == "semantics" else batch[task]
            )
            images, n_real = shard_batch(images)
            preds_pad, unc_pad = forward(params, images)
            d = dict(batch=batch, labels=labels, n_real=n_real,
                     preds=preds_pad[:n_real], unc=unc_pad[:n_real])
            if task == "coord":
                # per-image calibration: the solver takes focal as [B]
                # (`utils/evaluation.py:161-172` evaluates each image with
                # its own focal; a batch may mix calibrations)
                focal = jnp.asarray(np.asarray(batch["focal"], np.float32))
                focal, _ = shard_batch(focal)
                key, sub = jax.random.split(key)
                d["res"] = solve(preds_pad, focal, sub,
                                 (images.shape[1], images.shape[2]))
            elif task == "semantics" and opt.plot:
                d["images"] = images
            return d

        def consume(d):
            batch, labels, n_real = d["batch"], d["labels"], d["n_real"]
            preds, unc = d["preds"], d["unc"]
            file_name_ls.extend(os.path.basename(f) for f in batch["file_name"])

            if task == "coord":
                res = d["res"]
                for b in range(n_real):
                    t_err, r_err = evaluation.pose_err(batch["pose"][b], res.cam_to_world[b])
                    t_err_ls.append(t_err)
                    r_err_ls.append(r_err)
                    est_xyz_ls.append(np.asarray(res.cam_to_world[b][0:3, 3]))
                    coords_error_ls.append(
                        evaluation.coord_errors(preds[b][None], labels[b][None], nodata_value)
                    )
                    # per-frame stdout line, `utils/evaluation.py:189-190`
                    print(
                        "\nRotation Error: %.2f deg, Translation Error: %.1f m, "
                        "Mean coord prediction error: %.1f m"
                        % (r_err, t_err, float(np.mean(coords_error_ls[-1])))
                    )
                    if opt.save_pred:
                        fn = os.path.basename(batch["file_name"][b])
                        np.savez(
                            os.path.join(pred_dir, fn.replace(".png", ".npz")),
                            coord_pred=np.transpose(np.asarray(preds[b]), (2, 0, 1)),
                            coord_gt=np.transpose(np.asarray(labels[b]), (2, 0, 1)),
                            coord_unc=np.asarray(unc[b][..., 0]) if unc.shape[-1] else None,
                            pose_pred=np.asarray(res.cam_to_world[b]),
                            pose_gt=batch["pose"][b],
                            pose_t_err=t_err_ls[-1], pose_r_err=r_err_ls[-1],
                        )
            elif task == "depth":
                ar, rms = evaluation.depth_eval(preds, labels, nodata_value)
                depth_ar_ls.append(ar)
                depth_rms_ls.append(rms)
            elif task == "normal":
                normal_err_ls.append(evaluation.normal_eval(preds, labels, nodata_value))
            elif task == "semantics":
                pred_cls, miou, fwiou, acc = evaluation.semantic_eval(preds, labels)
                miou_ls.append(miou)
                fwiou_ls.append(fwiou)
                acc_ls.append(acc)
                if opt.plot:
                    from .visualize import semantic_plotter

                    semantic_plotter(
                        np.asarray(d["images"])[:n_real], pred_cls, np.asarray(labels),
                        network_path, this_section, len(acc_ls) - 1,
                    )
            else:
                raise NotImplementedError(task)

        # one-batch lookahead: batch i+1's device work is in flight while
        # batch i's host-side metrics/prints/saves run
        pending = None
        for batch in loader:
            d = dispatch(batch)
            if pending is not None:
                consume(pending)
            pending = d
        if pending is not None:
            consume(pending)

        print("{:s} Evaluating over section {:s} is done!{:s}".format("*" * 20, this_section, "*" * 20))
        if task == "coord":
            eval_str = evaluation.scene_coords_report(
                t_err_ls, r_err_ls, est_xyz_ls, coords_error_ls, testing_log,
                network_path, this_section, file_name_ls,
            )
        elif task == "depth":
            eval_str = evaluation.depth_report(depth_ar_ls, depth_rms_ls, testing_log, this_section)
        elif task == "normal":
            eval_str = evaluation.normal_report(normal_err_ls, testing_log, this_section)
        elif task == "semantics":
            eval_str = evaluation.semantic_report(acc_ls, miou_ls, fwiou_ls, testing_log, this_section)
        # operator-visible metric block, byte-identical to the file block
        # (the reference prints every section's summary to the console,
        # `utils/evaluation.py:231,287,332`)
        print(eval_str)

    print("Network testing finished. Please find the log at {:s}".format(testing_log))
    return testing_log


def main(argv=None):
    opt = config_parser().parse_args(argv)
    if opt.search_dir:
        opt.scene = opt.grayscale = opt.task = opt.section = None
        opt.tiny = opt.fullsize = opt.uncertainty = None
        print("search_dir is ON. Model parameters would be read from the folder name...")
    if isinstance(opt.uncertainty, str):
        if opt.uncertainty.lower() == "none":
            opt.uncertainty = None
        elif opt.uncertainty.lower() == "mle":
            opt.uncertainty = "MLE"

    network_paths = config_weight_path(
        opt.network_in, opt.keywords, opt.search_dir, opt.min_ckpt_iter, opt.max_ckpt_iter
    )
    for i, network_path in enumerate(network_paths):
        if opt.search_dir:
            folder = os.path.basename(os.path.dirname(network_path))
            scene, grayscale, task, sections, tiny, fullsize, uncertainty = (
                compat.read_meta_info(folder)
            )
        else:
            scene, grayscale, task = opt.scene, opt.grayscale, opt.task
            sections, tiny, fullsize, uncertainty = (
                opt.section, opt.tiny, opt.fullsize, opt.uncertainty
            )
        evaluate_network(
            opt, network_path, scene, grayscale, task, sections, tiny, fullsize, uncertainty
        )


if __name__ == "__main__":
    main()
