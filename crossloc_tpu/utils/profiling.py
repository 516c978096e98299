"""Profiling / tracing utilities.

TPU-native replacement for the plugin's `StopWatch` phase timer
(`dsacstar/stop_watch.h`, used at `dsacstar.cpp:97,117,140`) and the
per-iteration wall-time logging (`train_single_task.py:305-309`):
host-side section timers with *true* device synchronization, plus a
`jax.profiler` trace context for XLA-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import numpy as np

import jax


def device_sync(x) -> None:
    """Force completion of a device computation.

    On tunneled platforms `block_until_ready()` can return at dispatch time;
    pulling to the host is the only reliable barrier. Pull ONE element via an
    on-device gather (which queues behind the timed computation) — pulling
    the full array would time the tunnel transfer, not the device (a [64,
    480, 720, 32] activation is 1.4 GB; measured 20 s of pure transfer)."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        leaf = leaves[0]
        if hasattr(leaf, "ndim") and leaf.ndim > 0:
            leaf = leaf[(0,) * leaf.ndim]
        np.asarray(leaf)


class StopWatch:
    """Accumulating section timer: `with sw.section("solve"): ...`."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync_result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_result is not None:
                device_sync(sync_result)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in self.totals:
            n = self.counts[name]
            lines.append(
                f"{name}: total {self.totals[name]*1000:.1f}ms over {n} calls "
                f"({self.totals[name]/n*1000:.2f}ms avg)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """XLA-level profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 5, warmup: int = 2) -> float:
    """Seconds per call with compile excluded and true device sync."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / iters
