"""Shared loss utilities (validity masks, angle parametrizations, reduction).

Reference semantics: `utils/learning.py:38-71` (nodata / valid-point picking)
and `utils/learning.py:401-440` (azimuth-elevation parametrization).
All tensors are channels-last ([B, H, W, C] or [B, N, C]) — TPU-native NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NODATA_VALUE = -1.0  # urbanscape / naturescape scenes (`utils/learning.py:38-46`)


def get_nodata_value(scene_name: str) -> float:
    """Nodata marker by scene family (`utils/learning.py:38-46`)."""
    low = scene_name.lower()
    if "urbanscape" in low or "naturescape" in low:
        return -1.0
    raise NotImplementedError(f"unknown scene family: {scene_name}")


def valid_label_mask(labels, nodata_value):
    """[..., C] -> [...] True where no channel equals the nodata marker.

    Mirrors `pick_valid_points` (`utils/learning.py:49-71`) with boolean=True.
    """
    return jnp.all(labels != nodata_value, axis=-1)


def reduce_loss(per_image_loss, num_pixels_instance, reduction):
    """Reference reduction contract (`loss/coord.py:181-187` and siblings):
    'mean' -> scalar mean over every pixel in the batch;
    None   -> [B] per-instance means."""
    if reduction is None:
        return per_image_loss / num_pixels_instance
    if reduction == "mean":
        return jnp.sum(per_image_loss) / (per_image_loss.shape[0] * num_pixels_instance)
    raise NotImplementedError(f"reduction={reduction}")


def xyz2ae(xyz):
    """Unit direction -> (azimuth, elevation) radians. [..., 3] -> [..., 2].

    azimuth = atan2(y, x); elevation = atan2(z, ||xy||)
    (`utils/learning.py:401-414`).
    """
    azimuth = jnp.arctan2(xyz[..., 1], xyz[..., 0])
    elevation = jnp.arctan2(xyz[..., 2], jnp.linalg.norm(xyz[..., 0:2], axis=-1))
    return jnp.stack([azimuth, elevation], axis=-1)


def ae2xyz(ae):
    """(azimuth, elevation) radians -> unit direction. [..., 2] -> [..., 3].
    (`utils/learning.py:417-428`)."""
    az, el = ae[..., 0], ae[..., 1]
    cos_el = jnp.cos(el)
    xyz = jnp.stack([jnp.cos(az) * cos_el, jnp.sin(az) * cos_el, jnp.sin(el)], axis=-1)
    return xyz / jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-12)


def logits_to_radian(logits):
    """Raw activation -> angle in [-pi, pi] via clamped sigmoid
    (`utils/learning.py:431-440`)."""
    r = jnp.clip(jax.nn.sigmoid(logits), 1e-7, 1.0 - 1e-7)
    return (r * 2.0 - 1.0) * jnp.pi
