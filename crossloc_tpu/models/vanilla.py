"""Vanilla DSAC*-style scene-coordinate FCN (no GroupNorm), flax/NHWC.

Capability parity with `networks/networks.py:43-130` ("Network"): grayscale
input, strided conv stack, three residual stages without normalization (and,
unlike the TransPose variant, *no* ReLU after the skip-adds), 1x1 fc head to
3 channels, per-channel mean offset. Output subsampled 8x.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

OUTPUT_SUBSAMPLE = 8


class VanillaNetwork(nn.Module):
    tiny: bool = False
    mean_init: Optional[Sequence[float]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid, wide = (128, 128) if self.tiny else (256, 512)
        # symmetric padding k//2 == torch Conv2d(padding=k//2) (see ConvGN)
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=((k // 2, k // 2), (k // 2, k // 2)),
            dtype=self.dtype, name=name,
        )
        x = x.astype(self.dtype)
        x = nn.relu(conv(32, 3, 1, "conv1")(x))
        x = nn.relu(conv(64, 3, 2, "conv2")(x))
        x = nn.relu(conv(128, 3, 2, "conv3")(x))
        res = nn.relu(conv(mid, 3, 2, "conv4")(x))

        x = nn.relu(conv(mid, 3, 1, "res1_conv1")(res))
        x = nn.relu(conv(mid, 1, 1, "res1_conv2")(x))
        x = nn.relu(conv(mid, 3, 1, "res1_conv3")(x))
        res = res + x

        x = nn.relu(conv(wide, 3, 1, "res2_conv1")(res))
        x = nn.relu(conv(wide, 1, 1, "res2_conv2")(x))
        x = nn.relu(conv(wide, 3, 1, "res2_conv3")(x))
        if not self.tiny:
            res = conv(wide, 1, 1, "res2_skip")(res)
        res = res + x

        x = nn.relu(conv(wide, 1, 1, "res3_conv1")(res))
        x = nn.relu(conv(wide, 1, 1, "res3_conv2")(x))
        x = nn.relu(conv(wide, 1, 1, "res3_conv3")(x))
        res = res + x

        sc = nn.relu(conv(wide, 1, 1, "fc1")(res))
        sc = nn.relu(conv(wide, 1, 1, "fc2")(sc))
        sc = conv(3, 1, 1, "fc3")(sc).astype(jnp.float32)

        mean_init = self.mean_init if self.mean_init is not None else [0.0] * 3
        mean = self.param("mean", lambda key: jnp.asarray(mean_init, dtype=jnp.float32))
        return sc + jax.lax.stop_gradient(mean)
