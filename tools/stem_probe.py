"""Probe: space-to-depth re-layout of stem1/stem2 (VERDICT r2 #3a).

stem1 (3->32, k3 s1 @480x720) runs at ~2% MXU occupancy by shape (C_in=3);
stem2 (32->64, k3 s2) at ~25%. Space-to-depth(2) re-expresses both as
MXU-dense convs on a [H/2, W/2] grid with EXACT weight remaps:

  stem1: x_s2d [B,240,360,12] -> conv 3x3x12->128 == s2d of the original
         480x720x32 output (each of the 2x2 output phases gets its own
         32-channel block; taps scattered by phase arithmetic)
  stem2: input s2d [B,240,360,128] -> conv 2x2x128->64 == the original
         stride-2 output [B,240,360,64] directly (stride-2 output = phase
         (0,0) of the s2d grid)

GroupNorm(32 groups over 32 channels = per-channel) between them is computed
in the s2d layout by regrouping the 4 phase blocks per original channel.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from crossloc_tpu.utils.profiling import timeit

B, H, W = 64, 480, 720
GN_EPS = 1e-5


def s2d(x):
    Bb, Hh, Ww, C = x.shape
    x = x.reshape(Bb, Hh // 2, 2, Ww // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(Bb, Hh // 2, Ww // 2, 4 * C)  # channel = (pi*2+pj)*C + c


def remap_stem1(Wk):  # [3,3,3,32] -> [3,3,12,128]
    K = np.zeros((3, 3, 12, 128), Wk.dtype)
    for di in range(2):
        for dj in range(2):
            for kh in range(3):
                for kw in range(3):
                    a, pi = divmod(di - 1 + kh + 2, 2)  # +2 then a-1: avoid neg divmod
                    a -= 1
                    b, pj = divmod(dj - 1 + kw + 2, 2)
                    b -= 1
                    K[a + 1, b + 1, (pi * 2 + pj) * 3:(pi * 2 + pj) * 3 + 3,
                      (di * 2 + dj) * 32:(di * 2 + dj) * 32 + 32] += Wk[kh, kw]
    return K


def remap_stem2(Wk):  # [3,3,32,64] -> [2,2,128,64]
    K = np.zeros((2, 2, 128, 64), Wk.dtype)
    for kh in range(3):
        for kw in range(3):
            a, pi = divmod(-1 + kh + 2, 2)
            a -= 1
            b, pj = divmod(-1 + kw + 2, 2)
            b -= 1
            K[a + 1, b + 1, (pi * 2 + pj) * 32:(pi * 2 + pj) * 32 + 32] += Wk[kh, kw]
    return K


def gn_relu_per_channel(x, scale, bias, eps=GN_EPS):
    """per-channel GN (+ReLU), standard layout [B,H,W,C]."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return jax.nn.relu(y)


def gn_relu_s2d(x, scale, bias, C=32, eps=GN_EPS):
    """per-original-channel GN(+ReLU) in s2d layout [B,h,w,4*C]."""
    Bb, h, w, _ = x.shape
    xf = x.astype(jnp.float32).reshape(Bb, h, w, 4, C)
    mu = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2, 3), keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return jax.nn.relu(y).reshape(Bb, h, w, 4 * C)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
    w1 = rng.normal(size=(3, 3, 3, 32)).astype(np.float32) * 0.1
    b1 = rng.normal(size=(32,)).astype(np.float32) * 0.01
    g1 = np.abs(rng.normal(size=(32,)).astype(np.float32)) + 0.5
    be1 = rng.normal(size=(32,)).astype(np.float32) * 0.01
    w2 = rng.normal(size=(3, 3, 32, 64)).astype(np.float32) * 0.05
    b2 = rng.normal(size=(64,)).astype(np.float32) * 0.01
    g2 = np.abs(rng.normal(size=(64,)).astype(np.float32)) + 0.5
    be2 = rng.normal(size=(64,)).astype(np.float32) * 0.01

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

    def conv(x, k, stride, pad):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(k, x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=dn)

    @jax.jit
    def baseline(x):
        y = conv(x, w1, 1, 1) + jnp.asarray(b1, x.dtype)
        y = gn_relu_per_channel(y, g1, be1).astype(jnp.bfloat16)
        z = conv(y, w2, 2, 1) + jnp.asarray(b2, x.dtype)
        # stem2's GN has 32 groups over 64 ch -> groups of 2; approximate with
        # per-channel here (cost-identical, probe only times)
        z = gn_relu_per_channel(z, g2, be2).astype(jnp.bfloat16)
        return z

    k1 = remap_stem1(w1)
    k2 = remap_stem2(w2)
    b1_s2d = np.tile(b1, 4)

    # correctness first (small shapes, f32)
    xs_small = jnp.asarray(rng.normal(size=(2, 16, 20, 3)), jnp.float32)

    def base_small(x):
        y = conv(x, w1, 1, 1) + b1
        y = gn_relu_per_channel(y, g1, be1)
        return conv(y, w2, 2, 1) + b2

    def s2d_small(x):
        xs = s2d(x)
        y = conv(xs, k1, 1, 1) + jnp.tile(jnp.asarray(b1), 4)
        y = gn_relu_s2d(y, g1, be1)
        # 2x2 kernel with taps at a in {-1, 0}: pad 1 on the LOW side only
        z = jax.lax.conv_general_dilated(
            y, jnp.asarray(k2, y.dtype), (1, 1), [(1, 0), (1, 0)], dimension_numbers=dn)
        return z + b2

    ref = base_small(xs_small)
    got = s2d_small(xs_small)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"parity max abs err (f32, incl GN): {err:.2e}  (ref scale {float(jnp.max(jnp.abs(ref))):.1f})")
    assert err < 2e-4, err

    # timing on the big shape
    @jax.jit
    def s2d_big(x):
        xs = s2d(x)
        y = conv(xs, k1, 1, 1) + jnp.asarray(b1_s2d, x.dtype)
        y = gn_relu_s2d(y, g1, be1).astype(jnp.bfloat16)
        z = jax.lax.conv_general_dilated(
            y, jnp.asarray(k2, y.dtype), (1, 1), [(1, 0), (1, 0)], dimension_numbers=dn)
        z = gn_relu_per_channel(z + jnp.asarray(b2, z.dtype), g2, be2).astype(jnp.bfloat16)
        return z

    for name, fn in [("baseline stem1+2", baseline), ("s2d stem1+2", s2d_big)]:
        t = timeit(lambda: fn(x))
        print(f"{name}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
