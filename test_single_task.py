#!/usr/bin/env python3
"""Root-level entry point, arg-compatible with the reference test_single_task.py."""
from crossloc_tpu.cli.test_single_task import main

if __name__ == "__main__":
    main()
