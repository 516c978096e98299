"""Depth regression loss (L1, optional MLE) — parity with `loss/depth.py:7-76`.

Channels-last: depth_map [B, H, W, 1], gt_depths [B, H, W, 1].
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .common import reduce_loss, valid_label_mask


class DepthLossConfig(NamedTuple):
    min_depth: float = 0.1  # m: validity threshold on the prediction
    hard_clamp: float = 10.0  # m: max abs error for a *valid* prediction
    nodata_value: float = -1.0


def depth_loss(
    depth_map,
    gt_depths,
    uncertainty_map=None,
    config: DepthLossConfig = DepthLossConfig(),
    reduction: Optional[str] = "mean",
):
    """Returns (loss, valid_rate); the validity constraints only feed the
    reported rate, not the loss mask (matching `loss/depth.py:33-44`)."""
    B = depth_map.shape[0]
    pred = depth_map.reshape(B, -1)
    gt = gt_depths.reshape(B, -1)
    N = pred.shape[1]

    err = jnp.abs(pred - gt)
    valid_gt = valid_label_mask(gt[..., None], config.nodata_value)
    valid_depth = (pred >= config.min_depth) & (err <= config.hard_clamp) & valid_gt
    valid_rate = jnp.sum(valid_depth) / (B * N)

    valid_gt_f = valid_gt.astype(pred.dtype)
    if uncertainty_map is None:
        per_pixel = err * valid_gt_f
    else:
        # MLE: 1 log(sigma) + e^2 / (2 sigma^2)  (`loss/depth.py:52-57`)
        sigma = jnp.maximum(uncertainty_map.reshape(B, -1), 1e-7)
        e2 = jnp.maximum(jnp.square(err), 1e-7)
        loss_unc = 1.0 * jnp.log(sigma) + e2 / (2.0 * jnp.maximum(jnp.square(sigma), 1e-7))
        per_pixel = loss_unc * valid_gt_f

    loss = reduce_loss(jnp.sum(per_pixel, axis=1), N, reduction)
    return loss, valid_rate
