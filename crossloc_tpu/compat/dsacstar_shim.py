"""Drop-in replacement for the reference's `dsacstar` C++ extension module.

Exposes the plugin's exact four-function API (`dsacstar/dsacstar.cpp:887-892`)
over torch tensors — NCHW scene coordinates in, 4x4 pose written in place —
backed by the jit-compiled JAX solver. Lets code written against the
reference (`utils/evaluation.py:161-172`) run unmodified:

    import crossloc_tpu.compat.dsacstar_shim as dsacstar
    dsacstar.forward_rgb(scene_coords, out_pose, 64, 10, f, cx, cy, 100, 100, 8)

Gradient calls return the DSAC expected pose loss and fill the gradient
tensor, like `backward_rgb` / `backward_rgbd` (`dsacstar.cpp:200-885`).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ransac import PoseLossConfig, RansacConfig, expected_pose_loss, solve_batch, solve_rgbd


def _nchw_to_nhwc(t) -> np.ndarray:
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    return np.transpose(arr, (0, 2, 3, 1)).astype(np.float32)


def _write_pose(out_pose, pose_np):
    import torch

    out_pose.copy_(torch.from_numpy(np.asarray(pose_np, dtype=np.float32)))


def forward_rgb(
    scene_coordinates,
    out_pose,
    ransac_hypotheses: int,
    inlier_threshold: float,
    focal_length: float,
    ppoint_x: float,
    ppoint_y: float,
    inlier_alpha: float,
    max_reproj: float,
    sub_sampling: int,
    random_seed: int = 0,
):
    """Pose estimation (eval mode, argmax draw). Writes the cam-to-world
    4x4 into `out_pose` (parity with `dsacstar_rgb_forward`)."""
    coords = _nchw_to_nhwc(scene_coordinates)
    cfg = RansacConfig(
        hypotheses=ransac_hypotheses,
        inlier_threshold=inlier_threshold,
        inlier_alpha=inlier_alpha,
        max_pixel_error=max_reproj,
        subsample=sub_sampling,
    )
    # principal point defines the effective image size (center convention)
    image_hw = (2.0 * ppoint_y, 2.0 * ppoint_x)
    res = solve_batch(
        jnp.asarray(coords), focal_length, image_hw, jax.random.PRNGKey(random_seed), cfg
    )
    _write_pose(out_pose, np.asarray(res.cam_to_world[0]))
    return 0


def backward_rgb(
    scene_coordinates,
    out_scene_coordinates_grad,
    gt_pose,
    ransac_hypotheses: int,
    inlier_threshold: float,
    focal_length: float,
    ppoint_x: float,
    ppoint_y: float,
    w_loss_rot: float,
    w_loss_trans: float,
    soft_clamp: float,
    inlier_alpha: float,
    max_reproj: float,
    sub_sampling: int,
    random_seed: int,
):
    """DSAC training mode: expected pose loss + d(loss)/d(scene coords).

    Returns the expected loss (parity with `dsacstar_rgb_backward`); the
    reference's two hand-derived gradient paths fall out of jax.grad.
    """
    import torch

    coords = _nchw_to_nhwc(scene_coordinates)
    gt = np.asarray(gt_pose.detach().cpu().numpy() if hasattr(gt_pose, "detach") else gt_pose)
    cfg = RansacConfig(
        hypotheses=ransac_hypotheses,
        inlier_threshold=inlier_threshold,
        inlier_alpha=inlier_alpha,
        max_pixel_error=max_reproj,
        subsample=sub_sampling,
    )
    loss_cfg = PoseLossConfig(w_rot=w_loss_rot, w_trans=w_loss_trans, soft_clamp=soft_clamp)
    image_hw = (2.0 * ppoint_y, 2.0 * ppoint_x)

    def f(c):
        loss, _ = expected_pose_loss(
            c, jnp.asarray(gt)[None], focal_length, image_hw,
            jax.random.PRNGKey(random_seed), cfg, loss_cfg,
        )
        return loss

    loss, grad = jax.value_and_grad(f)(jnp.asarray(coords))
    grad_nchw = np.transpose(np.asarray(grad), (0, 3, 1, 2))
    out_scene_coordinates_grad.copy_(torch.from_numpy(grad_nchw))
    return float(loss)


def forward_rgbd(
    scene_coordinates,
    camera_coordinates,
    out_pose,
    ransac_hypotheses: int,
    inlier_threshold: float,
    inlier_alpha: float,
    max_dist_error: float,
    random_seed: int = 0,
):
    """RGB-D pose estimation via Kabsch hypotheses (parity with
    `dsacstar_rgbd_forward`; valid pixels are those with a nonzero camera
    coordinate, `dsacstar.cpp:518-526`)."""
    obj = _nchw_to_nhwc(scene_coordinates)
    eye = _nchw_to_nhwc(camera_coordinates)
    valid = np.any(eye != 0.0, axis=-1)
    cfg = RansacConfig(
        hypotheses=ransac_hypotheses,
        inlier_threshold=inlier_threshold,
        inlier_alpha=inlier_alpha,
        max_pixel_error=max_dist_error,
    )
    res = solve_rgbd(
        jnp.asarray(obj), jnp.asarray(eye), jnp.asarray(valid),
        jax.random.PRNGKey(random_seed), cfg,
    )
    _write_pose(out_pose, np.asarray(res.cam_to_world[0]))
    return 0


def backward_rgbd(
    scene_coordinates,
    camera_coordinates,
    out_scene_coordinates_grad,
    gt_pose,
    ransac_hypotheses: int,
    inlier_threshold: float,
    w_loss_rot: float,
    w_loss_trans: float,
    soft_clamp: float,
    inlier_alpha: float,
    max_dist_error: float,
    random_seed: int,
):
    """RGB-D training mode: expected pose loss + gradients wrt scene coords
    (parity with `dsacstar_rgbd_backward`). Differentiates through the
    Kabsch SVD (replacing the hand-ported svd_backward,
    `dsacstar_util_rgbd.h:101-191`)."""
    import torch

    from ..ransac.rgbd import expected_pose_loss_rgbd

    obj = jnp.asarray(_nchw_to_nhwc(scene_coordinates))
    eye = jnp.asarray(_nchw_to_nhwc(camera_coordinates))
    valid = jnp.asarray(np.any(np.asarray(eye) != 0.0, axis=-1))
    gt = jnp.asarray(
        gt_pose.detach().cpu().numpy() if hasattr(gt_pose, "detach") else np.asarray(gt_pose)
    )
    cfg = RansacConfig(
        hypotheses=ransac_hypotheses,
        inlier_threshold=inlier_threshold,
        inlier_alpha=inlier_alpha,
        max_pixel_error=max_dist_error,
    )
    loss_cfg = PoseLossConfig(w_rot=w_loss_rot, w_trans=w_loss_trans, soft_clamp=soft_clamp)

    def f(o):
        return expected_pose_loss_rgbd(
            o, eye, valid, gt[None], jax.random.PRNGKey(random_seed), cfg, loss_cfg
        )

    loss, grad = jax.value_and_grad(f)(obj)
    grad_nchw = np.transpose(np.asarray(grad), (0, 3, 1, 2))
    out_scene_coordinates_grad.copy_(torch.from_numpy(grad_nchw))
    return float(loss)
