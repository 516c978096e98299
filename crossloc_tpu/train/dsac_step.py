"""End-to-end DSAC training step: expected pose loss through the solver.

The reference ships this capability in the plugin (`backward_rgb`,
`dsacstar/dsacstar.cpp:200-483`) but none of its scripts call it (SURVEY.md
§2.2 N2) — training uses the proxy reprojection loss instead. Here the
capability is a first-class training mode: the network output feeds the
differentiable RANSAC solver and the DSAC expectation of the pose loss
(`E_h~p [ loss(refine(h), gt) ]`) backpropagates into the network through
both the score and refinement paths.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..ransac import PoseLossConfig, RansacConfig, expected_pose_loss
from .step import TrainBatch, TrainState


def make_dsac_train_step(
    model,
    tx,
    ransac_cfg: Optional[RansacConfig] = None,
    loss_cfg: Optional[PoseLossConfig] = None,
    subsample: int = 8,
):
    """(state, batch, key) -> (state, metrics) minimizing the expected pose
    loss end to end. The default solver config is downsized for training
    cost (fewer hypotheses / retry rounds than eval, like DSAC* practice);
    `subsample` must match the model's output grid (1 under --fullsize)."""
    if ransac_cfg is not None and ransac_cfg.subsample != subsample:
        # a cfg whose grid disagrees with the model's output grid would
        # silently project through the wrong pixel centers (the --fullsize
        # class of bug): refuse instead
        raise ValueError(
            f"ransac_cfg.subsample={ransac_cfg.subsample} conflicts with "
            f"subsample={subsample}; set the grid on the config you pass"
        )
    cfg = ransac_cfg or RansacConfig(
        hypotheses=16, sample_rounds=8, train_refine_steps=2, subsample=subsample
    )
    lcfg = loss_cfg or PoseLossConfig()
    ntc = model.num_task_channel

    def loss_fn(params, batch: TrainBatch, key):
        preds = model.apply({"params": params}, batch.images)
        coords = preds[..., :ntc].astype(jnp.float32)
        img_h, img_w = batch.images.shape[1], batch.images.shape[2]
        focal = jnp.reshape(batch.focal, (-1,))[0]
        loss, aux = expected_pose_loss(
            coords, batch.poses, focal, (img_h, img_w), key, cfg, lcfg,
            pp_shift=batch.pp_shift,
        )
        return loss, aux

    def train_step(state: TrainState, batch: TrainBatch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        # the reference clamps unstable solver jacobians (`dsacstar.cpp:411`);
        # global-norm clipping is the optimizer-level analog
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
