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


class CheckpointManager:
    """Rotating full-state checkpoints: save every call, keep the newest N.

    Two storage backends behind one interface; the interoperable `.net`
    snapshots remain the training loop's contract, this adds crash-exact
    resume with bounded disk use.

      * "msgpack" (default): single-file flax serialization with an atomic
        rename — zero extra dependencies, trivially inspectable.
      * "orbax": `orbax.checkpoint.CheckpointManager` — async-capable,
        multi-host coordinated (every process must call save/restore, which
        is the right contract for the `parallel.distributed` path).
    """

    def __init__(self, directory: str, keep: int = 5, prefix: str = "state",
                 backend: str = "msgpack", async_save: bool = True):
        self.directory = directory
        self.keep = keep
        self.prefix = prefix
        self.backend = backend
        # orbax saves are ASYNC by default: save() enqueues the write and
        # returns; the training loop overlaps the serialization/IO with the
        # next steps. Synchronization points: flush() (call at end of
        # training), restore_latest() (must see the newest step), and the
        # next save() (orbax serializes internally). Pass async_save=False
        # for strictly-synchronous saves (e.g. kill-tolerant tests that
        # SIGKILL right after save returns).
        self.async_save = async_save
        os.makedirs(directory, exist_ok=True)
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._mgr = ocp.CheckpointManager(
                os.path.abspath(directory),
                options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
            )
        elif backend != "msgpack":
            raise ValueError(f"unknown checkpoint backend: {backend!r}")

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"{self.prefix}_{step:09d}{STATE_SUFFIX}")

    def all_steps(self):
        steps = []
        for f in os.listdir(self.directory):
            if f.startswith(self.prefix + "_") and f.endswith(STATE_SUFFIX):
                try:
                    steps.append(int(f[len(self.prefix) + 1 : -len(STATE_SUFFIX)]))
                except ValueError:
                    continue
        return sorted(steps)

    def save(self, state: TrainState, step: Optional[int] = None) -> str:
        step = int(state.step) if step is None else int(step)
        # idempotent: the training loop saves beside every .net snapshot and
        # an epoch boundary can hit two snapshot sites at the same step
        # (python-side tracking — an async orbax save may not be visible in
        # latest_step() yet)
        if getattr(self, "_last_saved_step", None) == step:
            return self._path(step)
        if self.backend == "orbax":
            if self._mgr.latest_step() == step:
                return os.path.join(os.path.abspath(self.directory), str(step))
        elif (existing := self.all_steps()) and existing[-1] == step:
            return self._path(step)
        self._last_saved_step = step
        if self.backend == "orbax":
            self._mgr.save(step, args=self._ocp.args.StandardSave(
                jax.device_get(state)))
            if not self.async_save:
                self._mgr.wait_until_finished()
            return os.path.join(os.path.abspath(self.directory), str(step))
        path = save_train_state(self._path(step), state)
        for old in self.all_steps()[: -self.keep]:
            os.remove(self._path(old))
        return path

    def flush(self) -> None:
        """Block until any in-flight async save has committed."""
        if self.backend == "orbax":
            self._mgr.wait_until_finished()

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        if self.backend == "orbax":
            self._mgr.wait_until_finished()  # an in-flight save must land first
            step = self._mgr.latest_step()
            if step is None:
                return None
            restored = self._mgr.restore(
                step, args=self._ocp.args.StandardRestore(jax.device_get(template)))
            return restored if isinstance(restored, TrainState) else TrainState(*restored)
        steps = self.all_steps()
        if not steps:
            return None
        return load_train_state(self._path(steps[-1]), template)
