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
    checkpoint key grammar is unchanged; compute goes through the Pallas
    single-pass kernel when the block fits VMEM (crossloc_tpu/ops), with a
    pure-jnp fallback otherwise.
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
