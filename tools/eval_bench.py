"""Fused image->pose eval throughput bench + per-op profile.

Times exactly the bench.py program (CrossLoc coord net, MLE head, bf16 conv
compute, s2d stems + full-f32 RANSAC solver as ONE jit) with true device
sync, and optionally writes a jax.profiler trace for tools/parse_trace.py —
the tool behind the BENCH_NOTES fused-eval per-op wall tables.

A/B knobs for the fusion-tail levers (VERDICT r4 item: itemize the B=128
gap to the 675 img/s FLOP wall):
  --no-solver    net forward only (isolates the solver's share)
  --no-s2d       standard stems
  --dtype f32    full-f32 conv compute

Usage: python tools/eval_bench.py [--batches 128,256] [--iters 10]
                                  [--profile /tmp/eval_trace]
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
    ap.add_argument("--batches", default="128")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of the timed loop here")
    ap.add_argument("--no-solver", dest="solver", action="store_false")
    ap.add_argument("--no-s2d", dest="s2d", action="store_false")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    from crossloc_tpu import models, ransac

    model = models.build_network(
        "coord", uncertainty="MLE", mean=[-29.34, 184.17, 91.96],
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        stem_s2d=args.s2d,
    )
    cfg = ransac.RansacConfig()

    @jax.jit
    def localize(params, images, key):
        preds = model.apply(params, images)
        coords = preds[..., 0:3].astype(jnp.float32)
        if not args.solver:
            return coords
        res = ransac.solve_batch(coords, 480.0, (480, 720), key, cfg)
        return res.cam_to_world

    rng = np.random.default_rng(0)
    # params are batch-independent: init once (re-init per batch would add a
    # full re-trace + device compile per entry on this 1-2 vCPU box)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 480, 720, 3)))
    for batch in (int(b) for b in args.batches.split(",")):
        images = jnp.asarray(rng.normal(size=(batch, 480, 720, 3)), jnp.float32)
        key = jax.random.PRNGKey(1)

        out = localize(params, images, key)
        np.asarray(out[0, 0])  # compile + true device sync (axon tunnel)
        out = localize(params, images, jax.random.fold_in(key, 1))
        np.asarray(out[0, 0])

        if args.profile:
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = localize(params, images, jax.random.fold_in(key, 2 + i))
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        if args.profile:
            jax.profiler.stop_trace()
        print(f"fused eval B={batch}: {dt * 1e3:7.2f} ms -> {batch / dt:6.1f} img/s"
              f" ({batch / dt / 675.0 * 100:.1f}% of the 675 img/s wall)")


if __name__ == "__main__":
    main()
