"""Surface-normal regression loss in azimuth/elevation space.

Parity with `loss/normal.py:8-127`: circle loss on azimuth + L1 elevation,
angular-degree validity check via xyz cosine, optional MLE (2 log sigma).
Channels-last: normal_logits [B, H, W, 2], gt_normals [B, H, W, 3].
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .common import ae2xyz, logits_to_radian, reduce_loss, valid_label_mask, xyz2ae


class NormalLossConfig(NamedTuple):
    hard_clamp: float = 10.0  # degrees: angular validity threshold
    nodata_value: float = -1.0


def normal_loss(
    normal_logits,
    gt_normals,
    uncertainty_map=None,
    config: NormalLossConfig = NormalLossConfig(),
    reduction: Optional[str] = "mean",
):
    """Returns (loss, valid_rate)."""
    B = normal_logits.shape[0]
    logits = normal_logits.reshape(B, -1, 2)
    gt = gt_normals.reshape(B, -1, 3)
    N = logits.shape[1]

    pred_ae = logits_to_radian(logits)  # [B, N, 2] in [-pi, pi]
    gt_ae = xyz2ae(gt)

    # circle loss on azimuth + L1 on elevation (`loss/normal.py:36-43`)
    az_l1 = jnp.abs(gt_ae[..., 0] - pred_ae[..., 0])
    azimuth_loss = 2.0 * jnp.abs(jnp.minimum(az_l1, 2.0 * jnp.pi - az_l1))
    elevation_loss = jnp.abs(pred_ae[..., 1] - gt_ae[..., 1])
    reg_error = jnp.maximum(azimuth_loss + elevation_loss, 1e-7)  # [B, N]

    # validity from angular error in degrees (`loss/normal.py:65-73`)
    pred_xyz = jax.lax.stop_gradient(ae2xyz(pred_ae))
    cos_sim = jnp.sum(pred_xyz * gt, axis=-1) / jnp.maximum(
        jnp.linalg.norm(pred_xyz, axis=-1) * jnp.linalg.norm(gt, axis=-1), 1e-12
    )
    angle_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_sim, -1 + 1e-7, 1 - 1e-7)))

    valid_gt = valid_label_mask(gt, config.nodata_value)
    valid_normal = (angle_deg <= config.hard_clamp) & valid_gt
    valid_rate = jnp.sum(valid_normal) / (B * N)

    valid_gt_f = valid_gt.astype(logits.dtype)
    if uncertainty_map is None:
        per_pixel = reg_error * valid_gt_f
    else:
        # MLE: 2 log(sigma) + e^2 / (2 sigma^2)  (`loss/normal.py:101-106`)
        sigma = jnp.maximum(uncertainty_map.reshape(B, -1), 1e-7)
        e2 = jnp.maximum(jnp.square(reg_error), 1e-7)
        loss_unc = 2.0 * jnp.log(sigma) + e2 / (2.0 * jnp.maximum(jnp.square(sigma), 1e-7))
        per_pixel = loss_unc * valid_gt_f

    loss = reduce_loss(jnp.sum(per_pixel, axis=1), N, reduction)
    return loss, valid_rate
