"""Pose-solver throughput bench + per-op profile (solve_batch alone).

Times the eval-path RANSAC solve (`ransac.solve_batch`, the N1 component)
on synthetic scene-coordinate maps shaped like the real pipeline's output
(60x90 grid from 480x720 inputs), with true device sync. Use with
tools/parse_trace.py to get the per-op breakdown that drives accept/reject
perf decisions in BENCH_NOTES.md.

Usage: python tools/solver_bench.py [--batch 64] [--iters 20]
                                    [--profile /tmp/solver_trace]
                                    [--top-k 1] [--selection soft]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of the timed loop here")
    ap.add_argument("--top-k", type=int, default=1)
    ap.add_argument("--selection", default="soft", choices=["soft", "hard"])
    args = ap.parse_args()

    from crossloc_tpu import ransac

    B, HS, WS = args.batch, 60, 90
    cfg = ransac.RansacConfig(refine_top_k=args.top_k,
                              eval_selection=args.selection)

    # synthetic but geometrically plausible coords: a smooth world surface
    # + noise, so P3P validity rates and refine masks look like real evals
    rng = np.random.default_rng(0)
    xs, ys = np.meshgrid(np.linspace(-50, 50, WS), np.linspace(-40, 40, HS))
    base = np.stack([xs, ys, 120 + 10 * np.sin(xs / 9) * np.cos(ys / 7)], -1)
    coords = base[None] + rng.normal(scale=2.0, size=(B, HS, WS, 3))
    coords = jnp.asarray(coords, jnp.float32)

    @jax.jit
    def solve(coords, key):
        return ransac.solve_batch(coords, 480.0, (480, 720), key, cfg).cam_to_world

    key = jax.random.PRNGKey(1)
    out = solve(coords, key)
    np.asarray(out[0, 0, 0])  # compile + true sync
    out = solve(coords, key)
    np.asarray(out[0, 0, 0])

    def timed():
        t0 = time.perf_counter()
        o = None
        for i in range(args.iters):
            o = solve(coords, jax.random.fold_in(key, i))
        np.asarray(o[0, 0, 0])
        return (time.perf_counter() - t0) / args.iters

    if args.profile:
        with jax.profiler.trace(args.profile):
            dt = timed()
    else:
        dt = timed()
    print(f"solve_batch B={B} top_k={args.top_k} sel={args.selection}: "
          f"{dt * 1e3:7.2f} ms  {B / dt:8.1f} img/s")


if __name__ == "__main__":
    main()
