"""Native full-state checkpoints (params + optimizer + step).

The reference persists *weights only* and reconstructs training progress by
regex-parsing the log (`utils/io.py:26-53`, SURVEY.md §5) — Adam moments are
silently reset on resume. This module adds an exact-resume path as a
framework extension: the full TrainState is serialized with flax's msgpack
serialization next to the compat `.net` weight file. The `.net` file remains
the interoperable artifact; `.state` is the fault-tolerance artifact.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from flax import serialization

from .step import TrainState

STATE_SUFFIX = ".state"


def save_train_state(path: str, state: TrainState) -> str:
    """Serialize the full TrainState to `<path>.state` (msgpack)."""
    out = path + STATE_SUFFIX if not path.endswith(STATE_SUFFIX) else path
    data = serialization.to_bytes(jax.device_get(state))
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, out)  # atomic: a crash never leaves a torn checkpoint
    return out


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by save_train_state; `template` supplies
    the pytree structure (build it with create_train_state)."""
    src = path + STATE_SUFFIX if not path.endswith(STATE_SUFFIX) else path
    with open(src, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def latest_state_file(directory: str) -> Optional[str]:
    """Most recently modified *.state file in a directory, or None."""
    cands = [
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(STATE_SUFFIX)
    ]
    return max(cands, key=os.path.getmtime) if cands else None
