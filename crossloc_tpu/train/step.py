"""Jitted training step: forward + task loss + Adam update.

Mirrors the reference training loop body (`train_single_task.py:245-309`)
as one pure function: no host round trips, no `.cuda()` copies, no
per-iteration `empty_cache`. The uncertainty channel split
(`train_single_task.py:266-273`) happens on the last (channel) axis.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..geometry import intrinsics
from ..losses import (
    CoordLossConfig,
    DepthLossConfig,
    NormalLossConfig,
    depth_loss,
    normal_loss,
    scene_coords_loss,
    semantics_loss,
)


class TrainBatch(NamedTuple):
    """One training minibatch (all device arrays, NHWC)."""

    images: jnp.ndarray  # [B, H, W, C] normalized RGB or grayscale
    poses: jnp.ndarray  # [B, 4, 4] cam-to-world
    labels: jnp.ndarray  # [B, h, w, C_task] task ground truth
    focal: jnp.ndarray  # [] or [B] focal length (post-augmentation)
    pp_shift: Optional[jnp.ndarray] = None  # [2] principal-point offset from
    # the augmentation's zoom-in crop window (data.augment_batch), or None


def task_loss_fn(
    task: str,
    predictions,
    batch: TrainBatch,
    uncertainty: Optional[str],
    num_task_channel: int,
    nodata_value: float = -1.0,
    coord_cfg: Optional[CoordLossConfig] = None,
    depth_cfg: Optional[DepthLossConfig] = None,
    normal_cfg: Optional[NormalLossConfig] = None,
    reduction: Optional[str] = "mean",
):
    """Split the uncertainty channel and dispatch to the task loss."""
    if uncertainty == "MLE":
        preds = predictions[..., :num_task_channel]
        unc = predictions[..., num_task_channel:]
    else:
        preds, unc = predictions, None

    if task == "coord":
        cfg = coord_cfg or CoordLossConfig(nodata_value=nodata_value)
        img_h, img_w = batch.images.shape[1], batch.images.shape[2]
        focal = jnp.reshape(batch.focal, (-1,))[0]
        cam_mat = intrinsics(focal, img_w, img_h)
        if batch.pp_shift is not None:
            cam_mat = cam_mat.at[0, 2].add(batch.pp_shift[0]).at[1, 2].add(batch.pp_shift[1])
        return scene_coords_loss(preds, batch.labels, batch.poses, cam_mat, unc, cfg, reduction)
    if task == "depth":
        cfg = depth_cfg or DepthLossConfig(nodata_value=nodata_value)
        return depth_loss(preds, batch.labels, unc, cfg, reduction)
    if task == "normal":
        cfg = normal_cfg or NormalLossConfig(nodata_value=nodata_value)
        return normal_loss(preds, batch.labels, unc, cfg, reduction)
    if task == "semantics":
        return semantics_loss(preds, batch.labels, unc, reduction)
    raise NotImplementedError(f"task={task}")


def multistep_lr(
    base_lr: float,
    steps_per_epoch: int,
    milestones=(50, 100),
    gamma: float = 0.5,
    enabled: bool = True,
):
    """Epoch-milestone LR schedule: x gamma at each milestone epoch
    (`utils/learning.py:390-396`: MultiStepLR([50, 100], 0.5), or constant
    when scheduling is disabled)."""
    if not enabled:
        return base_lr

    boundaries = {int(m) * int(steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(
    learning_rate,
    steps_per_epoch: int = 1,
    no_lr_scheduling: bool = False,
    grad_clip: Optional[float] = None,
):
    """Adam with the reference's LR schedule; optional global-norm clip."""
    schedule = multistep_lr(learning_rate, steps_per_epoch, enabled=not no_lr_scheduling)
    tx = optax.adam(schedule)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, tx, example_images, rng=None) -> TrainState:
    rng = jax.random.PRNGKey(2021) if rng is None else rng
    variables = model.init(rng, example_images)
    params = variables["params"]
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    model,
    tx,
    task: str,
    uncertainty: Optional[str] = None,
    nodata_value: float = -1.0,
    coord_cfg: Optional[CoordLossConfig] = None,
    depth_cfg: Optional[DepthLossConfig] = None,
    normal_cfg: Optional[NormalLossConfig] = None,
):
    """Build the pure (state, batch) -> (state, metrics) step function.

    jit-able and pjit-able: under a mesh with the batch sharded on "data",
    XLA emits the gradient all-reduce automatically.
    """
    num_task_channel = model.num_task_channel

    def loss_fn(params, batch: TrainBatch):
        preds = model.apply({"params": params}, batch.images)
        loss, valid_rate = task_loss_fn(
            task, preds, batch, uncertainty, num_task_channel, nodata_value,
            coord_cfg, depth_cfg, normal_cfg,
        )
        return loss, valid_rate

    def train_step(state: TrainState, batch: TrainBatch):
        (loss, valid_rate), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "valid_rate": valid_rate,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
