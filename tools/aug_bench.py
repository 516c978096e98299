"""Standalone device-side augmentation bench (augment_batch only).

The train-step per-op profile showed the bilinear-resample gathers at
~94 GiB/s (28.5 ms/iter at B=64) — this isolates augment_batch so the
windowed-gather rewrite can be A/B'd. Usage:
  python tools/aug_bench.py [--batch 64] [--iters 20]
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
    args = ap.parse_args()

    from crossloc_tpu.data import AugmentConfig, augment_batch

    cfg = AugmentConfig()
    rng = np.random.default_rng(0)
    B = args.batch
    images = jnp.asarray(rng.uniform(size=(B, 480, 720, 3)), jnp.float32)
    labels = jnp.asarray(rng.normal(size=(B, 60, 90, 3)) * 5, jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    focal = jnp.asarray(480.0)

    @jax.jit
    def run(images, labels, poses, focal, key):
        out = augment_batch(images, labels, poses, focal, key, cfg)
        return out[0], out[1]

    key = jax.random.PRNGKey(0)
    im, lb = run(images, labels, poses, focal, key)
    np.asarray(im[0, 0, 0, 0])  # compile + true sync
    t0 = time.perf_counter()
    for i in range(args.iters):
        im, lb = run(images, labels, poses, focal, jax.random.fold_in(key, i))
    np.asarray(im[0, 0, 0, 0]), np.asarray(lb[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"augment_batch B={B}: {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
