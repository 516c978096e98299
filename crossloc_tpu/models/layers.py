"""Building blocks for the TransPose-style FCNs, flax/NHWC.

Parity targets (shapes + behavior, not code): `networks/networks.py:133-172`
(res block, MLR concatenator, MLR skip) and `networks/networks.py:259-273`
(dense upsampling convolution). All convs are channels-last so XLA lays them
onto the MXU directly; GroupNorm statistics run in fp32 for stability while
conv compute may be bf16.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


GN_EPS = 1e-5  # torch nn.GroupNorm default (the reference's normalizer)

# GroupNorm variance algorithm. The fast path (E[x2]-E[x]2, one pass over
# HBM) is the default: 452 vs 392 img/s net-forward at B=16 on v5e — the
# two-pass centered variance costs ~13%. The fast path's catastrophic
# cancellation adds benign fp32 noise that spatial sharding regroups,
# amplifying sharded-vs-unsharded GRADIENT differences to ~1e-4 of the
# global gradient scale (forward stays at ~1e-5; harmless for SGD). Flip to
# False (BEFORE tracing — jit caches the traced choice) for bit-honest
# gradient reproducibility under spatial sharding, e.g. in equivalence
# tests. See BENCH_NOTES.md "GroupNorm variance algorithm".
_GN_FAST_VARIANCE = True


def set_gn_fast_variance(enabled: bool) -> None:
    global _GN_FAST_VARIANCE
    _GN_FAST_VARIANCE = bool(enabled)


def gn_fast_variance() -> bool:
    return _GN_FAST_VARIANCE


class GroupNormFused(nn.Module):
    """GroupNorm with fp32 statistics and optional fused ReLU.

    Parameter layout ('scale'/'bias') matches flax.linen.GroupNorm, so the
    checkpoint key grammar is unchanged. Compute is the pure-jnp path (XLA
    fuses it); the Pallas single-pass kernel in crossloc_tpu/ops is OPT-IN
    (`ops.pallas_groupnorm.enable_pallas`) and measured 2.5x SLOWER than
    XLA's reduce on TPU (BENCH_NOTES) — it is kept as an experiment record,
    not the live path.
    """

    num_groups: int
    relu: bool = False
    eps: float = GN_EPS

    @nn.compact
    def __call__(self, x):
        from ..ops import groupnorm_relu

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return groupnorm_relu(x, scale, bias, self.num_groups, self.eps, self.relu)


class ConvGN(nn.Module):
    """Conv -> GroupNorm(fp32 stats) [-> fused ReLU if relu=True]."""

    features: int
    kernel: int = 3
    stride: int = 1
    num_groups: int = 32
    dtype: Dtype = jnp.float32
    relu: bool = False
    name_conv: str = "conv"
    name_norm: str = "norm"

    @nn.compact
    def __call__(self, x):
        # explicit symmetric padding = torch Conv2d(padding=k//2): XLA "SAME"
        # pads (0, 1) for stride 2, shifting the sampling grid by one pixel
        # relative to the reference convs — that would break `.net` imports
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dtype=self.dtype,
            name=self.name_conv,
        )(x)
        groups = min(self.num_groups, self.features)
        # flax GroupNorm in fp32: XLA fuses the normalize+relu epilogue into
        # the surrounding convs, which profiling showed beats both a Pallas
        # fused kernel and a reshape-based jnp version (see ops/ docstring)
        x = nn.GroupNorm(num_groups=groups, epsilon=GN_EPS, dtype=jnp.float32,
                         use_fast_variance=gn_fast_variance(),
                         name=self.name_norm)(x.astype(jnp.float32))
        if self.relu:
            x = nn.relu(x)
        return x.astype(self.dtype)


class ResBlock(nn.Module):
    """3x3 -> 1x1 -> 3x3 convs, each GN+ReLU; caller adds the skip.

    Mirrors `_create_res_block` (`networks/networks.py:133-146`): channel
    count is preserved, GN groups = min(num_groups, channels).
    """

    features: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, k in enumerate((3, 1, 3)):
            x = ConvGN(
                self.features,
                kernel=k,
                num_groups=self.num_groups,
                dtype=self.dtype,
                relu=True,
                name_conv=f"conv{i + 1}",
                name_norm=f"norm{i + 1}",
                name=f"layer{i + 1}",
            )(x)
        return x


class MLRConcatenator(nn.Module):
    """Merge block over concatenated MLR activations
    (`_create_mlr_concatenator`, `networks/networks.py:149-163`)."""

    features: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, k in enumerate((3, 1, 3)):
            x = ConvGN(
                self.features,
                kernel=k,
                num_groups=self.num_groups,
                dtype=self.dtype,
                relu=True,
                name_conv=f"conv{i + 1}",
                name_norm=f"norm{i + 1}",
                name=f"layer{i + 1}",
            )(x)
        return x


class MLRSkip(nn.Module):
    """1x1 conv + GN skip for MLR (`_create_mlr_skip_layer`,
    `networks/networks.py:166-172`). No ReLU (applied after the add)."""

    features: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return ConvGN(
            self.features, kernel=1, num_groups=self.num_groups, dtype=self.dtype
        )(x)


class _ConvParams(nn.Module):
    """Declare conv kernel/bias params without running nn.Conv — the
    space-to-depth stem path consumes them through remapped kernels while
    keeping the param tree (and so the `.net` checkpoint grammar) identical
    to the standard ConvGN stack."""

    features: int
    kernel: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _GNParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return s, b


def _s2d(x):
    """space-to-depth(2), phase-minor channel order: c_out = c * 4 + phase."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, h, w, C, pi, pj
    return x.reshape(B, H // 2, W // 2, C * 4)


def _remap_stem1_kernel(Wk, C_in, C_out):
    """[3,3,C_in,C_out] -> [3,3,4*C_in,4*C_out] s2d(2) kernel, both sides
    phase-minor (in: cin*4+phase_in, out: c*4+phase_out). Output phase
    (di,dj) of s2d cell (i,j) is the original conv at (2i+di, 2j+dj); tap
    (kh,kw) lands in s2d cell (i+a, j+b) phase (pi,pj) with
    (a,pi)=divmod(di-1+kh, 2) etc. Pure scatter — exact, differentiable."""
    K = jnp.zeros((3, 3, 4 * C_in, 4 * C_out), Wk.dtype)
    for di in range(2):
        for dj in range(2):
            for kh in range(3):
                for kw in range(3):
                    a, pi = divmod(di - 1 + kh, 2)
                    b, pj = divmod(dj - 1 + kw, 2)
                    pin = pi * 2 + pj
                    pout = di * 2 + dj
                    K = K.at[a + 1, b + 1, pin::4, pout::4].add(Wk[kh, kw])
    return K


def _remap_stem2_kernel(Wk, C_in, C_out):
    """[3,3,C_in,C_out] stride-2 conv -> [2,2,4*C_in,C_out] on the s2d grid
    (stride-2 outputs are exactly phase (0,0) of each s2d cell)."""
    K = jnp.zeros((2, 2, 4 * C_in, C_out), Wk.dtype)
    for kh in range(3):
        for kw in range(3):
            a, pi = divmod(-1 + kh, 2)
            b, pj = divmod(-1 + kw, 2)
            pin = pi * 2 + pj
            K = K.at[a + 1, b + 1, pin::4, :].add(Wk[kh, kw])
    return K


class StemParams(nn.Module):
    """Param holder shaped exactly like a ConvGN stem ("conv" kernel/bias +
    "norm" scale/bias). Instantiated with name="stem1"/"stem2" from the
    encoder, it reproduces the standard param paths while the s2d math
    consumes the tensors directly."""

    features: int
    in_features: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        k, b = _ConvParams(self.features, self.kernel, self.in_features, name="conv")()
        s, sb = _GNParams(self.features, name="norm")()
        return k, b, s, sb


def _gn_grouped(x, groups, fast_variance, eps=GN_EPS):
    """flax-GroupNorm-equivalent statistics (no affine) over the last axis
    split into `groups`: reduction over (H, W, channels-in-group)."""
    B, H, W, C = x.shape
    xg = x.reshape(B, H, W, groups, C // groups)
    if fast_variance:
        mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xg), axis=(1, 2, 4), keepdims=True) - jnp.square(mu)
        var = jnp.maximum(var, 0.0)
    else:
        mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xg - mu), axis=(1, 2, 4), keepdims=True)
    y = (xg - mu) * jax.lax.rsqrt(var + eps)
    return y.reshape(B, H, W, C)


def stem_s2d_apply(x, p1, p2, num_groups=32, dtype=jnp.float32):
    """stems 1+2 evaluated in space-to-depth(2) layout — MXU-dense exact
    re-expression of ConvGN(f1,k3,s1) + ConvGN(f2,k3,s2) on full-res RGB
    (C_in=3 runs at ~2% MXU occupancy in the standard layout; measured
    -4.5 ms at B=64/480x720 on v5e, BENCH_NOTES.md round 3). p1/p2 are
    StemParams outputs; the param tree and values are IDENTICAL to the
    standard path, only the computation layout differs (exact to float
    reassociation).

    GroupNorm grouping: the s2d channel order is c-major/phase-minor, so
    original group g's channels+phases form one contiguous block of
    4*group_size channels — grouped statistics in s2d layout equal the
    original ones exactly.
    """
    k1, b1, g1, gb1 = p1
    k2, b2, g2, gb2 = p2
    C_in, f1 = k1.shape[2], k1.shape[3]
    f2 = k2.shape[3]

    xs = _s2d(x.astype(dtype))  # [B, H/2, W/2, 4*C_in]
    K1 = _remap_stem1_kernel(k1, C_in, f1).astype(dtype)
    dn = jax.lax.conv_dimension_numbers(xs.shape, K1.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xs, K1, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    y = y + jnp.repeat(b1, 4).astype(y.dtype)

    groups = min(num_groups, f1)
    y = _gn_grouped(y.astype(jnp.float32), groups, gn_fast_variance())
    y = nn.relu(y * jnp.repeat(g1, 4) + jnp.repeat(gb1, 4)).astype(dtype)

    K2 = _remap_stem2_kernel(k2, f1, f2).astype(dtype)
    dn2 = jax.lax.conv_dimension_numbers(y.shape, K2.shape, ("NHWC", "HWIO", "NHWC"))
    z = jax.lax.conv_general_dilated(
        y, K2, (1, 1), [(1, 0), (1, 0)], dimension_numbers=dn2)
    z = z + b2.astype(z.dtype)
    z = _gn_grouped(z.astype(jnp.float32), min(num_groups, f2), gn_fast_variance())
    z = nn.relu(z * g2 + gb2)
    return z.astype(dtype)


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle with torch channel ordering (c major, r1, r2).

    [B, H, W, C*r*r] -> [B, H*r, W*r, C]; matches nn.PixelShuffle semantics
    used by the DUC head (`networks/networks.py:268`).
    """
    B, H, W, CRR = x.shape
    C = CRR // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r1, W, r2, C
    return x.reshape(B, H * r, W * r, C)


class DenseUpsamplingConv(nn.Module):
    """DUC head: conv3x3 -> GN -> ReLU -> PixelShuffle(rate)
    (`networks/networks.py:259-273`)."""

    rate: int
    num_classes: int
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        up_ch = self.rate * self.rate * self.num_classes
        x = ConvGN(up_ch, kernel=3, num_groups=self.num_groups, dtype=self.dtype, relu=True)(x)
        return pixel_shuffle(x, self.rate)


def bilinear_resize(x, out_h: int, out_w: int):
    """NHWC bilinear resize, half-pixel centers (== torch align_corners=False,
    `networks/networks.py:347`)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, out_h, out_w, C), method="bilinear")
