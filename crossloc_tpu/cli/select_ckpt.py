"""Checkpoint-selection CLI (parity with `script_clean_validation/select_ckpt.py`)."""
from __future__ import annotations

import argparse

from ..eval import select_checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, required=True,
                        help='"coord", "depth", "normal" or "semantics"')
    parser.add_argument("--work_dir", type=str, default=".",
                        help="directory holding results_*task_*.txt (framework extension)")
    args = parser.parse_args(argv)
    flag = select_checkpoint(args.task, args.work_dir)
    print("\nCheckpoint selection flag is saved at: {:s}".format(flag))


if __name__ == "__main__":
    main()
