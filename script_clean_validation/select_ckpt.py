#!/usr/bin/env python3
"""Checkpoint selection wrapper (parity with the reference's
script_clean_validation/select_ckpt.py); ranks results_*task_*.txt in the
current directory and writes FLAG_SELECTED_ITER_*.nodata."""
from crossloc_tpu.cli.select_ckpt import main

if __name__ == "__main__":
    main()
