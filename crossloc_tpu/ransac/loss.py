"""Pose loss and the DSAC expected-loss training objective.

Parity targets: pose distance + soft clamp (`dsacstar_loss.h:47-85`) and the
expected loss over the hypothesis distribution computed by the training-mode
solver (`dsacstar.cpp:200-483`, `backward_rgb`). The reference's ~1000 lines
of hand-written derivative code disappear: `jax.grad` differentiates through
soft-inlier scoring, softmax, and the unrolled Gauss-Newton refinement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import invert_se3, pixel_grid, pose_vec_to_w2c, intrinsics
from .config import PoseLossConfig, RansacConfig
from .solver import (
    _project_errors,
    refine_pose,
    sample_hypotheses,
    soft_inlier_score,
)


def pose_loss(est_c2w, gt_c2w, cfg: PoseLossConfig = PoseLossConfig()):
    """w_rot * angular-deg + w_trans * ||dt||, sqrt-soft-clamped above `cut`
    and hard-clamped at MAXLOSS (`dsacstar_loss.h:47-85`). Broadcasts."""
    R1 = est_c2w[..., 0:3, 0:3]
    R2 = gt_c2w[..., 0:3, 0:3]
    rot_diff = jnp.einsum("...ij,...kj->...ik", R2, R1)  # R2 @ R1^T
    trace = rot_diff[..., 0, 0] + rot_diff[..., 1, 1] + rot_diff[..., 2, 2]
    trace = jnp.clip(trace, -1.0, 3.0)
    # exact arccos value, but gradient taken at an interior-clamped argument:
    # arccos' blows up at the boundary (hit exactly when est == gt)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    cos_in = jnp.clip(cos_t, -1.0 + 1e-6, 1.0 - 1e-6)
    ang = jnp.arccos(cos_in)
    ang = ang + jax.lax.stop_gradient(jnp.arccos(cos_t) - ang)
    rot_err = jnp.degrees(ang)
    dt = est_c2w[..., 0:3, 3] - gt_c2w[..., 0:3, 3]
    t_err = jnp.sqrt(jnp.sum(dt * dt, axis=-1) + 1e-12)
    loss = cfg.w_rot * rot_err + cfg.w_trans * t_err
    loss = jnp.where(loss > cfg.soft_clamp, jnp.sqrt(cfg.soft_clamp * jnp.maximum(loss, 1e-12)), loss)
    return jnp.minimum(loss, cfg.max_loss)


def expected_pose_loss(
    scene_coords,
    gt_poses,
    focal_length,
    image_hw,
    key,
    cfg: RansacConfig = RansacConfig(),
    loss_cfg: PoseLossConfig = PoseLossConfig(),
    pp_shift=None,
):
    """End-to-end DSAC training objective: E_h~p [ loss(refine(h), gt) ].

    scene_coords [B, Hs, Ws, 3] (differentiable input), gt_poses [B, 4, 4]
    cam-to-world; pp_shift [2] (or [B, 2]) offsets the solver camera's
    principal point — REQUIRED when training on augmented batches whose
    zoom-in crop window moved it (up to ~(W-1)/2·(s-1) input pixels,
    data/augment.py:241-247; the solver would otherwise be systematically
    biased on every zoom-in batch). All hypotheses are refined (the
    reference refines every hypothesis with prob > 1e-3,
    `dsacstar_derivative.h:36`; static shapes make "all" the TPU-native
    choice), each with `train_refine_steps`.

    Returns (expected_loss scalar, aux dict). Gradients flow through both
    the score path (softmax weights) and the hypothesis path (unrolled GN),
    i.e. both gradient terms of `dsacstar.cpp:344-480` fall out of autodiff.
    """
    B, Hs, Ws, _ = scene_coords.shape
    N = Hs * Ws
    grid = pixel_grid(Hs, Ws, cfg.subsample, dtype=scene_coords.dtype).reshape(N, 2)
    img_h, img_w = image_hw
    focal = jnp.broadcast_to(jnp.asarray(focal_length, scene_coords.dtype), (B,))
    cams = intrinsics(focal, img_w, img_h, dtype=scene_coords.dtype)
    if pp_shift is not None:
        from .solver import apply_pp_shift

        cams = apply_pp_shift(cams, pp_shift, B, scene_coords.dtype)
    coords = scene_coords.reshape(B, N, 3)
    keys = jax.random.split(key, B)

    def per_image(c, K, k, gt):
        pose6, hyp_valid = sample_hypotheses(c, grid, K, k, cfg)
        errs = _project_errors(pose6, c, grid, K, cfg.max_pixel_error)
        scores = soft_inlier_score(errs, cfg)
        safe = jnp.where(hyp_valid, scores, -jnp.inf)
        safe = jnp.where(jnp.any(hyp_valid), safe, jnp.zeros_like(scores))
        probs = jax.nn.softmax(safe)

        refined = jax.vmap(
            lambda p: refine_pose(p, c, grid, K, cfg, steps=cfg.train_refine_steps)
        )(pose6)
        est_c2w = invert_se3(pose_vec_to_w2c(refined))
        losses = pose_loss(est_c2w, gt, loss_cfg)  # [H]
        losses = jnp.where(hyp_valid, losses, 0.0)
        return jnp.sum(probs * losses)

    # full-f32 matmul precision: TPU DEFAULT degrades the solver geometry
    # 2.2x (see solve_batch docstring / BENCH_NOTES.md)
    with jax.default_matmul_precision("float32"):
        exp_loss = jax.vmap(per_image)(coords, cams, keys, gt_poses)
    return jnp.mean(exp_loss), {"per_image": exp_loss}
