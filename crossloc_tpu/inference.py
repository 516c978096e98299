"""Fused image -> pose inference pipeline: network forward + RANSAC solve
in one jit program.

This is the path the reference runs as GPU-net -> host copy -> C++ plugin
(`test_single_task.py:328-400` -> `utils/evaluation.py:135-190`), with the
device->host->C++ boundary eliminated (SURVEY.md §3.3). Batched over images;
the reference solver is batch=1 only (`dsacstar.cpp:52`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ransac import RansacConfig, solve_batch


def make_localizer(model, cfg: RansacConfig = RansacConfig(), training: bool = False):
    """Build fn(params, images, focal, key) -> (scene_coords, RansacResult).

    images: [B, H, W, C] normalized; focal: scalar (shared across batch, as
    in the reference's eval loader). The model's first `num_task_channel`
    outputs must be scene coordinates (coord task).
    """
    @jax.jit
    def localize(params, images, focal, key) -> tuple:
        preds = model.apply({"params": params}, images)
        coords = preds[..., 0:3].astype(jnp.float32)
        hw = (images.shape[1], images.shape[2])
        result = solve_batch(coords, focal, hw, key, cfg, training=training)
        return coords, result

    return localize
