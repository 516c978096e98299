"""Pinhole camera model, pure jnp.

One camera model shared by the loss, the solver and the label generator —
the reference has three separate implementations that must agree
(`loss/coord.py:7-57`, `dsacstar/dsacstar_util.h:59-76`,
`dataloader/dataloader.py:444-486`); here they are a single source of truth.
"""
from __future__ import annotations

import jax.numpy as jnp


def intrinsics(focal_length, width, height, dtype=jnp.float32):
    """3x3 camera matrix; principal point assumed at the image center
    (reference: `loss/coord.py:7-17`, `utils/evaluation.py:168-170`)."""
    f = jnp.asarray(focal_length, dtype=dtype)
    zero = jnp.zeros_like(f)
    one = jnp.ones_like(f)
    row0 = jnp.stack([f, zero, jnp.full_like(f, width / 2.0)], axis=-1)
    row1 = jnp.stack([zero, f, jnp.full_like(f, height / 2.0)], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def pixel_grid(out_h: int, out_w: int, subsample: int = 8, dtype=jnp.float32):
    """Pixel centers of the subsampled prediction grid, shape [out_h, out_w, 2].

    Convention: x * subsample + subsample / 2 (reference:
    `utils/learning.py:29-32` and `dsacstar_util.h:70-72`; note the C++ uses
    integer division `subSampling / 2` while the python grid uses float
    `SUBSAMPLE / 2` — identical for even subsampling, which is the only case
    used; we use the float convention).
    """
    xs = jnp.arange(out_w, dtype=dtype) * subsample + subsample / 2.0
    ys = jnp.arange(out_h, dtype=dtype) * subsample + subsample / 2.0
    gx, gy = jnp.meshgrid(xs, ys)  # [out_h, out_w] each
    return jnp.stack([gx, gy], axis=-1)


def project(points_cam, cam_mat, min_depth=None):
    """Project camera-frame points to pixels.

    points_cam: [..., N, 3]; cam_mat: [..., 3, 3] -> pixels [..., N, 2].
    If min_depth is given, z is clamped from below before the division
    (reference: `loss/coord.py:52`).
    """
    proj = jnp.einsum("...ij,...nj->...ni", cam_mat, points_cam)
    z = proj[..., 2:3]
    if min_depth is not None:
        z = jnp.maximum(z, min_depth)
    return proj[..., 0:2] / z


def backproject(pixels, depth, cam_mat_or_focal, width=None, height=None):
    """Lift pixels + depth to camera-frame points.

    pixels: [..., N, 2]; depth: [..., N]; returns [..., N, 3].
    Accepts either a 3x3 camera matrix or (focal, width, height) — the
    reference's dense-label generator (`dataloader/dataloader.py:458-475`)
    uses the focal/center form.
    """
    if width is None:
        cam = cam_mat_or_focal
        fx = cam[..., 0, 0]
        fy = cam[..., 1, 1]
        cx = cam[..., 0, 2]
        cy = cam[..., 1, 2]
    else:
        fx = fy = jnp.asarray(cam_mat_or_focal)
        cx = jnp.asarray(width / 2.0)
        cy = jnp.asarray(height / 2.0)
    x = (pixels[..., 0] - cx[..., None]) / fx[..., None] * depth
    y = (pixels[..., 1] - cy[..., None]) / fy[..., None] * depth
    return jnp.stack([x, y, depth], axis=-1)


def reprojection_errors(points_cam, pixels, cam_mat, min_depth=0.1, max_err=None):
    """Per-point pixel reprojection error, the solver/loss workhorse.

    points_cam: [..., N, 3], pixels: [..., N, 2] -> [..., N].
    The z-clamp matches `loss/coord.py:52`; the optional max clamp matches
    the solver's maxReproj clamp (`dsacstar_util.h:441`).
    """
    proj = project(points_cam, cam_mat, min_depth=min_depth)
    err = jnp.linalg.norm(proj - pixels, axis=-1)
    if max_err is not None:
        err = jnp.minimum(err, max_err)
    return err
