"""Microbenchmark: bf16 3x3 conv MXU efficiency vs batch on v5e.

Separates the B=12 train-step gap (BENCH_NOTES round-4 profile: the
60x90x512 conv+GN fusions run at ~56% of the conv FLOP wall at B=12 but
~wall at B=64) into its candidates:
  * bare conv  — is the compiler's conv itself slower per-FLOP at small M?
  * conv + GroupNorm epilogue — does the fused stats reduce cost the rest?
  * weight-grad-shaped contraction — same question for the backward.

Usage: python tools/conv_probe.py [--batches 12,24,64] [--iters 30]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W, C = 60, 90, 512
FLOP_PER_IMG = 2 * H * W * 9 * C * C  # one 3x3xCxC conv
PEAK = 197e12  # v5e bf16


def timeit(fn, *args, iters):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[0]), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[0]), out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="12,24,64")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    kernel = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3, C, C)) * 0.02,
                         jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers((1, H, W, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv(x):
        return jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME",
                                            dimension_numbers=dn)

    @jax.jit
    def conv_gn(x):
        y = jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME",
                                         dimension_numbers=dn)
        yf = y.astype(jnp.float32).reshape(y.shape[0], -1, 32, C // 32)
        mean = jnp.mean(yf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=(1, 3), keepdims=True)
        out = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
        return out.reshape(y.shape).astype(jnp.bfloat16)

    @jax.jit
    def wgrad(x, dy):
        # d(kernel): contract batch+spatial; shapes as XLA emits for 3x3 SAME
        return jax.lax.conv_general_dilated(
            jnp.transpose(x, (3, 1, 2, 0)), jnp.transpose(dy, (1, 2, 0, 3)),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (C, H, W, 1), (H, W, 1, C), ("NHWC", "HWIO", "NHWC")),
        )

    for b in (int(s) for s in args.batches.split(",")):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(b, H, W, C)),
                        jnp.bfloat16)
        dy = jnp.asarray(np.random.default_rng(2).normal(size=(b, H, W, C)),
                         jnp.bfloat16)
        wall = b * FLOP_PER_IMG / PEAK
        t1 = timeit(conv, x, iters=args.iters)
        t2 = timeit(conv_gn, x, iters=args.iters)
        try:
            t3 = timeit(wgrad, x, dy, iters=args.iters)
            w3 = f"{t3 * 1e3:7.3f} ms ({wall / t3 * 100:5.1f}%)"
        except Exception as e:
            w3 = f"n/a ({type(e).__name__})"
        print(f"B={b:3d} wall={wall * 1e3:6.3f} ms | conv {t1 * 1e3:7.3f} ms "
              f"({wall / t1 * 100:5.1f}%) | conv+GN {t2 * 1e3:7.3f} ms "
              f"({wall / t2 * 100:5.1f}%) | wgrad {w3}")


if __name__ == "__main__":
    main()
