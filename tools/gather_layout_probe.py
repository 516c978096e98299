"""Probe: corner-gather DMA efficiency vs image memory layout.

The augment resample's dominant op is ONE windowed corner gather
(345,600 rows = one per output pixel; the batch shares the warp, so each
row fetches the [B, 2, 2, C] corner block for every image at once —
BENCH_NOTES round 3). From the shipped [B, H, W, C] image layout each row
touches B separate image planes: 4 taps x B fragments of C elements
(~6-12 bytes each). From a batch-inside [H, W, B*C] layout the same row is
4 taps x ONE contiguous B*C fragment — ~12x fewer DMA fragments for
identical bytes. This probe measures the gather (+ its bilinear-weighted
reduce consumer) in isolation under both layouts, including the one-time
transpose costs, to decide whether the augment path should re-lay the
image before resampling.

Usage: python tools/gather_layout_probe.py [--batch 12] [--iters 20]
       [--dtype bf16|f32]
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
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    B, H, W, C = args.batch, 480, 720, 3
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, H, W, C)), dt)
    # clipped window starts + bilinear weights, like data/augment.py
    ys = jnp.asarray(rng.integers(0, H - 1, size=(H * W,)), jnp.int32)
    xs = jnp.asarray(rng.integers(0, W - 1, size=(H * W,)), jnp.int32)
    wy = jnp.asarray(rng.random((H * W,)), jnp.float32)
    wx = jnp.asarray(rng.random((H * W,)), jnp.float32)

    def weights():
        w00 = (1 - wy) * (1 - wx)
        w01 = (1 - wy) * wx
        w10 = wy * (1 - wx)
        w11 = wy * wx
        return jnp.stack([jnp.stack([w00, w01], -1), jnp.stack([w10, w11], -1)], 1)

    @jax.jit
    def gather_b_outside(img):
        # shipped layout: rows index [H, W] of a [B, H, W, C] operand
        win = img[:, ys[:, None, None] + jnp.arange(2)[None, :, None],
                  xs[:, None, None] + jnp.arange(2)[None, None, :], :]  # [B,N,2,2,C]
        w = weights()  # [N,2,2]
        out = jnp.einsum("bnijc,nij->bnc", win.astype(jnp.float32), w)
        return out.astype(dt)

    @jax.jit
    def gather_b_inside(img):
        # batch-inside layout: one contiguous [B*C] fragment per tap
        imgT = jnp.transpose(img, (1, 2, 0, 3)).reshape(H, W, B * C)
        win = imgT[ys[:, None, None] + jnp.arange(2)[None, :, None],
                   xs[:, None, None] + jnp.arange(2)[None, None, :], :]  # [N,2,2,B*C]
        w = weights()
        out = jnp.einsum("nijk,nij->nk", win.astype(jnp.float32), w)  # [N,B*C]
        out = out.reshape(H * W, B, C).transpose(1, 0, 2)
        return out.astype(dt)

    def timed(fn, tag):
        out = fn(img)
        np.asarray(out).ravel()[0]  # true sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(img)
        np.asarray(out).ravel()[0]
        dtms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{tag:>12s}: {dtms:7.2f} ms")
        return out, dtms

    o1, t1 = timed(gather_b_outside, "B-outside")
    o2, t2 = timed(gather_b_inside, "B-inside")
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"max abs diff: {err:.2e}   speedup: {t1 / t2:.2f}x")


if __name__ == "__main__":
    main()
