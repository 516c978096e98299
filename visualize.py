#!/usr/bin/env python3
"""Root-level entry point, arg-compatible with the reference visualize.py."""
from crossloc_tpu.cli.visualize import main

if __name__ == "__main__":
    main()
