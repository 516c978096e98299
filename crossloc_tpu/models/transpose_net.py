"""TransPose-style encoder/decoder FCN family, flax/NHWC.

Capability parity with `networks/networks.py:175-502` (TransPoseNetEncoder,
TransPoseNetDecoder, TransPoseNet with MLR composition), re-designed for TPU:

  * channels-last layout so every conv maps straight onto the MXU;
  * GroupNorm statistics in fp32, conv compute in a configurable dtype
    (bfloat16 on TPU);
  * encoder freezing expressed as `jax.lax.stop_gradient` on the frozen
    encoders' activations — the TPU-native equivalent of
    `param.requires_grad = False` (`networks/networks.py:426-429`): zero
    gradient flows *and* the backward pass for those towers is skipped;
  * the per-scene output mean is a parameter (checkpoint parity with the
    reference's `mean` buffer) wrapped in stop_gradient so it never trains.

Output: [B, H/8, W/8, task+pos] (or full-size with the DUC head), where the
last `num_pos_channel` channels pass through exp(clip(x, -16.10, 13.82)) to
land in [1e-7, 1e6] (`networks/networks.py:353-358`).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    ConvGN,
    GroupNormFused,
    DenseUpsamplingConv,
    MLRConcatenator,
    MLRSkip,
    ResBlock,
    bilinear_resize,
)

Dtype = Any

OUTPUT_SUBSAMPLE = 8


def _widths(tiny: bool):
    """(mid, wide) channel counts: 256/512 normally, 128/128 for tiny."""
    return (128, 128) if tiny else (256, 512)


class TransPoseEncoder(nn.Module):
    """Strided conv stack + two residual stages (+ optional extra blocks).

    Shape parity with `networks/networks.py:175-256`; input is NHWC RGB
    (3ch) or grayscale (1ch), output is [B, H/8, W/8, wide].
    """

    tiny: bool = False
    enc_add_res_block: int = 2
    num_groups: int = 32
    dtype: Dtype = jnp.float32
    # evaluate stems 1+2 in space-to-depth(2) layout: exact remap of the
    # same params (tree unchanged), MXU-dense for the C_in=3 full-res conv.
    # Requires even H/W; see layers.StemS2DPair and BENCH_NOTES.md round 3.
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x):
        mid, wide = _widths(self.tiny)
        g = self.num_groups
        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            from .layers import StemParams, stem_s2d_apply

            p1 = StemParams(g, x.shape[-1], name="stem1")()
            p2 = StemParams(64, g, name="stem2")()
            x = stem_s2d_apply(x, p1, p2, num_groups=g, dtype=self.dtype)
        else:
            x = ConvGN(g, 3, 1, g, self.dtype, relu=True, name="stem1")(x)
            x = ConvGN(64, 3, 2, g, self.dtype, relu=True, name="stem2")(x)
        x = ConvGN(128, 3, 2, g, self.dtype, relu=True, name="stem3")(x)
        res = ConvGN(mid, 3, 2, g, self.dtype, relu=True, name="stem4")(x)

        x = res
        for i, k in enumerate((3, 1, 3)):
            x = ConvGN(mid, k, 1, g, self.dtype, relu=True, name=f"res1_{i + 1}")(x)
        res = nn.relu(res + x)

        x = res
        for i, k in enumerate((3, 1, 3)):
            x = ConvGN(wide, k, 1, g, self.dtype, relu=True, name=f"res2_{i + 1}")(x)
        if not self.tiny:
            res = ConvGN(wide, 1, 1, g, self.dtype, name="res2_skip")(res)
        res = nn.relu(res + x)

        for i in range(self.enc_add_res_block):
            x = ResBlock(wide, g, self.dtype, name=f"add_res{i + 1}")(res)
            res = nn.relu(res + x)
        return res


class TransPoseDecoder(nn.Module):
    """Residual 1x1 stage + fc head (+ optional DUC full-size upsampling).

    Shape parity with `networks/networks.py:276-360`. `mean` is stored as a
    frozen parameter of length num_task_channel.
    """

    num_task_channel: int = 3
    num_pos_channel: int = 1
    tiny: bool = False
    dec_add_res_block: int = 2
    num_groups: int = 32
    full_size_output: bool = False
    mean_init: Optional[Sequence[float]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, up_hw: Optional[tuple] = None):
        _, wide = _widths(self.tiny)
        g = self.num_groups
        res = x
        for i in range(self.dec_add_res_block):
            x = ResBlock(wide, g, self.dtype, name=f"add_res{i + 1}")(res)
            res = nn.relu(res + x)

        x = res
        for i in range(3):
            x = ConvGN(wide, 1, 1, g, self.dtype, relu=True, name=f"res3_{i + 1}")(x)
        res = nn.relu(res + x)

        sc = ConvGN(wide, 1, 1, g, self.dtype, relu=True, name="fc1")(res)
        sc = ConvGN(wide, 1, 1, g, self.dtype, relu=True, name="fc2")(sc)

        out_ch = self.num_task_channel + self.num_pos_channel
        if self.full_size_output:
            sc = DenseUpsamplingConv(
                OUTPUT_SUBSAMPLE, out_ch, g, self.dtype, name="duc"
            )(sc)
            if up_hw is not None:
                sc = bilinear_resize(sc, up_hw[0], up_hw[1])
        sc = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="fc3")(sc)
        sc = sc.astype(jnp.float32)

        mean_init = self.mean_init
        if mean_init is None:
            mean_init = [0.0] * self.num_task_channel
        mean = self.param(
            "mean",
            lambda key: jnp.asarray(mean_init, dtype=jnp.float32),
        )
        mean = jax.lax.stop_gradient(mean)  # buffer semantics: never trained
        task = sc[..., : self.num_task_channel] + mean

        if self.num_pos_channel:
            # positive-channel squash to [1e-7, 1e6] (`networks.py:353-358`)
            pos = jnp.exp(jnp.clip(sc[..., self.num_task_channel :], -16.10, 13.82))
            return jnp.concatenate([task, pos], axis=-1)
        return task


class TransPoseNet(nn.Module):
    """Full network: vanilla encoder OR >=1 MLR encoders -> merge -> decoder.

    Capability parity with `networks/networks.py:363-502`. num_mlr == 0 uses
    a single trainable encoder; num_mlr > 0 runs that many encoder towers,
    freezing all but the first `num_unfrozen_encoder` via stop_gradient,
    concatenates their activations and merges through skip + norm + conv
    blocks before the decoder.
    """

    num_task_channel: int = 3
    num_pos_channel: int = 1
    tiny: bool = False
    grayscale: bool = False
    enc_add_res_block: int = 2
    dec_add_res_block: int = 2
    num_groups: int = 32
    num_mlr: int = 0
    num_unfrozen_encoder: int = 0
    full_size_output: bool = False
    mean_init: Optional[Sequence[float]] = None
    dtype: Dtype = jnp.float32
    remat: bool = False  # jax.checkpoint the encoder towers (memory <-> FLOPs)
    stem_s2d: bool = False  # space-to-depth stems (layers.stem_s2d_apply)

    @property
    def output_subsample(self) -> int:
        return 1 if self.full_size_output else OUTPUT_SUBSAMPLE

    @nn.compact
    def __call__(self, x):
        _, wide = _widths(self.tiny)
        g = self.num_groups
        up_hw = (x.shape[1], x.shape[2])
        x = x.astype(self.dtype)

        enc_cls = nn.remat(TransPoseEncoder) if self.remat else TransPoseEncoder
        if self.num_mlr == 0:
            res = enc_cls(
                self.tiny, self.enc_add_res_block, g, self.dtype, self.stem_s2d,
                name="encoder"
            )(x)
        else:
            acts = []
            for i in range(self.num_mlr):
                a = enc_cls(
                    self.tiny, self.enc_add_res_block, g, self.dtype, self.stem_s2d,
                    name=f"mlr_encoder_{i + 1}",
                )(x)
                if i >= self.num_unfrozen_encoder:
                    a = jax.lax.stop_gradient(a)
                acts.append(a)
            mlr = jnp.concatenate(acts, axis=-1)  # [B, h, w, wide * num_mlr]
            res = MLRSkip(wide, g, self.dtype, name="mlr_skip")(mlr)
            from .layers import GN_EPS, gn_fast_variance

            mlr = nn.GroupNorm(num_groups=g, epsilon=GN_EPS, dtype=jnp.float32,
                               use_fast_variance=gn_fast_variance(),
                               name="mlr_norm")(mlr.astype(jnp.float32)).astype(self.dtype)
            mlr = MLRConcatenator(wide, g, self.dtype, name="mlr_forward")(mlr)
            res = nn.relu(res + mlr)

        return TransPoseDecoder(
            self.num_task_channel,
            self.num_pos_channel,
            self.tiny,
            self.dec_add_res_block,
            g,
            self.full_size_output,
            self.mean_init,
            self.dtype,
            name="decoder",
        )(res, up_hw if self.full_size_output else None)


class ProjHead(nn.Module):
    """Strided conv projection head -> global-average-pooled feature vector.

    Parity with `networks/networks.py:505-541` (defined-but-unused in the
    reference's pipelines; provided for API completeness).
    """

    out_length: int = 2048
    tiny: bool = False
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, wide = _widths(self.tiny)
        g = self.num_groups
        x = ConvGN(wide, 3, 2, g, self.dtype, relu=True, name="proj1")(x)
        x = ConvGN(wide, 3, 2, g, self.dtype, relu=True, name="proj2")(x)
        x = ConvGN(wide, 3, 2, g, self.dtype, relu=True, name="proj3")(x)
        x = ConvGN(self.out_length, 1, 1, g, self.dtype, relu=True, name="proj4")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


def task_channels(task: str) -> int:
    """coord 3, normal 2, depth 1, semantics 6 (`utils/learning.py:273-282`)."""
    table = {"coord": 3, "normal": 2, "depth": 1, "semantics": 6}
    if task not in table:
        raise NotImplementedError(f"task={task}")
    return table[task]


def build_network(
    task: str,
    uncertainty: Optional[str] = None,
    tiny: bool = False,
    grayscale: bool = False,
    fullsize: bool = False,
    num_mlr: int = 0,
    num_unfrozen_encoder: int = 0,
    mean: Optional[Sequence[float]] = None,
    dtype: Dtype = jnp.float32,
    remat: bool = False,
    stem_s2d: bool = False,
) -> TransPoseNet:
    """Factory matching `config_network` (`utils/learning.py:266-305`):
    enc/dec_add_res_block=2, +1 positive channel iff MLE uncertainty."""
    if uncertainty not in (None, "MLE"):
        raise NotImplementedError(f"uncertainty={uncertainty}")
    if task == "semantics" and uncertainty is not None:
        raise NotImplementedError("semantics has no uncertainty head")
    if task == "semantics" and not fullsize:
        raise NotImplementedError("semantics requires fullsize output")
    return TransPoseNet(
        num_task_channel=task_channels(task),
        num_pos_channel=0 if uncertainty is None else 1,
        tiny=tiny,
        grayscale=grayscale,
        enc_add_res_block=2,
        dec_add_res_block=2,
        num_mlr=num_mlr,
        num_unfrozen_encoder=num_unfrozen_encoder,
        full_size_output=fullsize,
        mean_init=mean,
        dtype=dtype,
        remat=remat,
        stem_s2d=stem_s2d,
    )
