"""Logging / output-directory / resume infrastructure.

Behavioral parity with `utils/io.py` (reference):
  * `read_training_log` — recover (iteration, epoch) by regex-parsing the
    last 100 lines of `output.log` (`utils/io.py:26-53`); the log file IS
    the training-state store (weights-only checkpoints, SURVEY.md §5).
  * `config_directory` — auto_resume reuses the output dir + the newest of
    model{,_auto_resume,_epoch_plus_resume,_resume}.net; epoch_plus finds a
    finished sibling run with the largest -eN (`utils/io.py:75-208`).
  * `config_log` — file+stdout logging with the reference's format, git SHA,
    and full-arg dump (`utils/io.py:211-256`).
"""
from __future__ import annotations

import copy
import glob
import logging
import os
import re
import shutil
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_RESUME_CANDIDATES = (
    "model_auto_resume.net",
    "model.net",
    "model_epoch_plus_resume.net",
    "model_resume.net",
)


def safe_printout(words: str) -> None:
    if logging.getLogger().hasHandlers():
        logging.info(words)
    else:
        print(words)


def read_training_log(log_path: str, iter_per_epoch: int) -> Tuple[int, int]:
    """(last_iteration, last_epoch) from the tail of output.log."""
    with open(log_path) as f:
        tail = "".join(f.readlines()[-100:])
    pattern = r"Iteration:\s+(?P<iter>\d+), Epoch:\s+(?P<epoch>\d+)"
    matches = re.findall(pattern, tail)
    if not matches:
        safe_printout("Maybe this is an empty training log. Setting last_iteration and last_epoch to 0...")
        return 0, 0
    last_iteration = max(int(m[0]) for m in matches)
    last_epoch = max(int(m[1]) for m in matches)
    if abs(last_iteration // iter_per_epoch - last_epoch) > 5:
        raise AssertionError(
            "Last iteration {:d} does not match last epoch {:d} with iteration per epoch being {:d}.".format(
                last_iteration, last_epoch, iter_per_epoch
            )
        )
    return last_iteration, last_epoch


def get_unique_file_name(file_path: str) -> str:
    """'<...>/<section>/rgb/name.png' -> 'name.png@<section>'."""
    section = os.path.basename(os.path.dirname(os.path.dirname(file_path)))
    return os.path.basename(file_path) + "@" + section


def get_epoch_from_dirname(model_dirname: str) -> Optional[int]:
    # the epoch token is always glued to the learning rate ("-e{d}-lr{f}",
    # compat/naming.py) — anchoring on the "-lr" that follows keeps the
    # framework's "-e2e" pose-loss token (and any "-e..." session string)
    # from matching as a second epoch
    found = re.findall(r"-e(?P<epoch>\d+)(?=-lr)", model_dirname)
    return int(found[0]) if len(found) == 1 else None


def _has_model(d: str) -> bool:
    return any(os.path.exists(os.path.join(d, m)) for m in _RESUME_CANDIDATES)


def search_epoch_extension_model(output_dir: str) -> str:
    """Find the finished sibling run with the largest -eN to extend."""
    dirname = os.path.basename(output_dir)
    cur_epoch = get_epoch_from_dirname(dirname)
    key = f"-e{cur_epoch}"
    # locate the epoch token by its "-lr" anchor (an "-e2" substring can
    # also occur inside the "-e2e" token or a session name)
    pos = dirname.find(key + "-lr")
    prefix = dirname[:pos]
    suffix = dirname[pos + len(key):]

    candidates, epochs = [], []
    for entry in glob.glob(os.path.abspath(os.path.join(output_dir, "../*"))):
        if not os.path.isdir(entry):
            continue
        base = os.path.basename(entry)
        if prefix in entry and suffix in entry:
            e = get_epoch_from_dirname(base)
            if e is None:
                continue
            done = os.path.exists(os.path.join(entry, "FLAG_training_done.nodata"))
            has_log = os.path.exists(os.path.join(entry, "output.log"))
            if _has_model(entry) and done and has_log:
                candidates.append(entry)
                epochs.append(e)
    if not candidates:
        raise RuntimeError("No plausible model to read for epoch extension experiments.")
    best = candidates[int(np.argmax(epochs))]
    print(f"Epoch extension: loading checkpoint from {best}")
    return best


def _stdin_is_foreground_tty() -> bool:
    """True only when stdin is a TTY AND this process is in the terminal's
    foreground process group — a backgrounded job (`train ... &`) keeps the
    controlling TTY on stdin, and calling input() from it stops the job
    with SIGTTIN instead of prompting anyone."""
    try:
        fd = sys.stdin.fileno()
        return sys.stdin.isatty() and os.tcgetpgrp(fd) == os.getpgrp()
    except (AttributeError, OSError, ValueError):
        return False


def config_directory(
    output_dir: str,
    ckpt_dir: str,
    auto_resume: bool,
    epoch_plus: bool,
    default_network_in: Optional[str] = None,
    overwrite: Optional[bool] = None,
    mutate_fs: bool = True,
):
    """Resolve the output/checkpoint dirs and the weight to resume from.

    Returns (output_dir, ckpt_output_dir, network_to_load, auto_resume,
    epoch_plus). `overwrite=None` keeps the reference's interactive
    overwrite prompt (`utils/io.py:194`) when stdin is a foreground TTY
    and falls back to overwriting for non-interactive runs (the bash
    harness); pass True/False to force either behavior. `mutate_fs=False`
    computes paths and resume weights WITHOUT creating or wiping any
    directory — multi-host non-main ranks must pass this, or concurrent
    makedirs/rmtree on a shared filesystem race with the main rank.
    """
    output_dir = os.path.abspath(output_dir)
    ckpt_output_dir = (
        os.path.abspath(os.path.join(ckpt_dir, os.path.basename(output_dir)))
        if ckpt_dir
        else output_dir
    )

    if auto_resume:
        ok = (
            os.path.exists(output_dir)
            and os.path.exists(os.path.join(output_dir, "output.log"))
            and _has_model(output_dir)
        )
        auto_resume = ok
    print(f"Effective auto resume: {auto_resume}")

    _epoch_plus = copy.copy(epoch_plus)
    resume_dir = None
    if epoch_plus:
        if auto_resume:
            epoch_plus = False
        else:
            resume_dir = search_epoch_extension_model(output_dir)
    print(f"Effective epoch extension: {epoch_plus}")

    if auto_resume or epoch_plus:
        if auto_resume:
            resume_dir = output_dir
        elif mutate_fs:
            os.makedirs(output_dir, exist_ok=True)
        if os.path.exists(os.path.join(resume_dir, "model_auto_resume.net")):
            existing = os.path.join(resume_dir, "model_auto_resume.net")
        elif auto_resume and _epoch_plus:
            existing = os.path.join(resume_dir, "model_epoch_plus_resume.net")
        elif os.path.exists(os.path.join(resume_dir, "model_epoch_plus_resume.net")) and not auto_resume:
            existing = os.path.join(resume_dir, "model_epoch_plus_resume.net")
        elif default_network_in is None:
            existing = os.path.join(resume_dir, "model.net")
        else:
            existing = os.path.join(resume_dir, "model_resume.net")
        if not os.path.exists(existing):
            raise FileNotFoundError(f"Expected model weight at {existing} is not found!")
        network_to_load = os.path.abspath(existing)
        if mutate_fs:
            os.makedirs(ckpt_output_dir, exist_ok=True)
    elif mutate_fs:
        if os.path.exists(output_dir):
            if overwrite is None:
                if _stdin_is_foreground_tty():
                    key = input("Output directory already exists! Overwrite? (y/n)")
                    overwrite = key.lower() == "y"
                else:
                    overwrite = True
            if overwrite:
                shutil.rmtree(output_dir)
            os.makedirs(output_dir, exist_ok=True)
        else:
            os.makedirs(output_dir)
        if os.path.exists(ckpt_output_dir):
            shutil.rmtree(ckpt_output_dir)
        os.makedirs(ckpt_output_dir, exist_ok=True)
        network_to_load = None
    else:
        network_to_load = None

    return output_dir, ckpt_output_dir, network_to_load, auto_resume, epoch_plus


def _git_sha() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL, text=True
        ).strip()
    except Exception:
        return "unknown"


def config_log(opt, output_dirname: str, file_logging: bool = True) -> Tuple[str, str]:
    """Set up file+stdout logging; returns (output_dir, ckpt_output_dir).

    Mutates `opt.network_in` / `opt.auto_resume` / `opt.epoch_plus` exactly
    like the reference (`utils/io.py:211-256`). `file_logging=False` keeps
    stdout-only logging (multi-host: only process 0 may write `output.log` —
    the log is the resume/metrics store, and concurrent writers corrupt it)
    and also disables directory creation/wiping (`mutate_fs`), since on a
    shared filesystem non-main ranks racing makedirs/rmtree against the
    main rank can delete its freshly created output dir.
    """
    output_dir, ckpt_output_dir, network_to_load, flag_ar, flag_ep = config_directory(
        output_dirname, opt.ckpt_dir, opt.auto_resume, opt.epoch_plus, opt.network_in,
        mutate_fs=file_logging,
    )
    if not (opt.network_in is not None and network_to_load is None):
        opt.network_in = network_to_load
    opt.auto_resume = flag_ar
    opt.epoch_plus = flag_ep

    log_file = os.path.join(output_dir, "output.log")
    if opt.epoch_plus and file_logging:
        shutil.copy2(os.path.join(os.path.dirname(network_to_load), "output.log"), log_file)

    # reset handlers so repeated in-process calls (tests) behave
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    mode = "a" if (opt.auto_resume or opt.epoch_plus) else "w"
    handlers = [logging.StreamHandler(sys.stdout)]
    if file_logging:
        handlers.append(logging.FileHandler(log_file, mode=mode))
    logging.basicConfig(
        level=logging.INFO,
        handlers=handlers,
        format="%(asctime)s, %(levelname)s: %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        force=True,
    )
    if opt.auto_resume:
        logging.info("***** Automatic resume training from {:s} *****".format(opt.network_in))
    elif opt.epoch_plus:
        logging.info("***** Epoch extension resume training from {:s} *****".format(opt.network_in))
    else:
        logging.info("***** A new training has been started *****")
    logging.info("Current git head hash code: %s" % _git_sha())
    logging.info("Path to save data: {:s}".format(output_dir))
    logging.getLogger("PIL").setLevel(logging.INFO)
    logging.info("Arg parser: ")
    logging.info(opt)
    logging.info("Saving model to {:s}".format(output_dir))
    logging.info("Saving checkpoint model to {:s}".format(ckpt_output_dir))
    return output_dir, ckpt_output_dir


def check_encoders(
    encoders: list,
    coord_weight: str,
    depth_weight: Optional[str],
    normal_weight: Optional[str],
    semantics_weight: Optional[str],
) -> list:
    """Validate/order MLR encoder weight paths; coord first
    (`utils/io.py:259-287`)."""
    for entry in encoders:
        if entry not in ("coord", "depth", "normal", "semantics"):
            raise ValueError(f"encoder model {entry} is not supported!")
    if "coord" not in encoders:
        raise ValueError(
            "A coordinate regression network weight must be provided for decoder initialization!"
        )
    encoders = sorted(set(encoders))
    paths = []
    by_task = {
        "coord": coord_weight,
        "depth": depth_weight,
        "normal": normal_weight,
        "semantics": semantics_weight,
    }
    for entry in encoders:
        w = by_task[entry]
        if w is None or not os.path.exists(w):
            raise FileNotFoundError(f"weight for encoder '{entry}' not found: {w}")
        if entry == "coord":
            paths.insert(0, w)
        else:
            paths.append(w)
    safe_printout("{:d} network weights are to be loaded for reuse".format(len(paths)))
    return paths
