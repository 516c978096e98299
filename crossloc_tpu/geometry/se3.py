"""SE(3) / SO(3) primitives, pure jnp and fully vmappable.

Conventions (matching the reference semantics, not its code):
  * A *camera pose* ("pose" in dataset files) is a 4x4 cam-to-world matrix
    (reference: dataloader poses/ files; `loss/coord.py:29` inverts it).
  * A *scene pose* is the world-to-cam (rvec, tvec) OpenCV-style pair used
    by the solver internals (reference: `dsacstar/dsacstar_util.h:759-790`).
    We pack it as a 6-vector [rvec(3), tvec(3)].
All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def hat(w):
    """Skew-symmetric matrix of a 3-vector. [..., 3] -> [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(rvec):
    """Axis-angle -> rotation matrix. [..., 3] -> [..., 3, 3].

    Taylor-safe near theta=0 (no NaN under jit or grad).
    Matches cv2.Rodrigues semantics (reference uses OpenCV Rodrigues in
    `dsacstar_util.h:762` and `utils/evaluation.py:128`).
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    # sin(t)/t and (1-cos(t))/t^2 with series fallback for tiny angles
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    K = hat(rvec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def inverse_rodrigues(R):
    """Rotation matrix -> axis-angle. [..., 3, 3] -> [..., 3].

    Safe for angles near 0 and near pi (uses the diagonal fallback at pi).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)

    # axis from the antisymmetric part; ||w|| = 2 sin(theta) exactly, so
    # theta = atan2(||w||/2, cos_t) is well conditioned near pi, unlike
    # arccos, whose fp32 error near -1 scales like sqrt(eps).
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = 0.5 * jnp.sqrt(jnp.sum(w * w, axis=-1) + 1e-24)  # NaN-grad-safe
    theta = jnp.arctan2(sin_t, cos_t)
    generic = w * (theta / jnp.maximum(2.0 * sin_t, _EPS))[..., None]

    # near-pi case: axis from diagonal of (R + I) / 2 = aa^T for theta=pi
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag + 1.0) * 0.5, 1e-12)  # floor: sqrt'(0) is inf
    axis = jnp.sqrt(axis2)
    # fix signs using off-diagonal sums: sign(a_i a_j) = sign(R_ij + R_ji)
    # anchor the largest component positive
    amax = jnp.argmax(axis2, axis=-1)
    sxy = jnp.sign(R[..., 0, 1] + R[..., 1, 0])
    sxz = jnp.sign(R[..., 0, 2] + R[..., 2, 0])
    syz = jnp.sign(R[..., 1, 2] + R[..., 2, 1])
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    # choose signs relative to the anchor component
    sx = jnp.where(amax == 0, 1.0, jnp.where(amax == 1, sxy, sxz))
    sy = jnp.where(amax == 0, sxy, jnp.where(amax == 1, 1.0, syz))
    sz = jnp.where(amax == 0, sxz, jnp.where(amax == 1, syz, 1.0))
    axis_pi = jnp.stack([sx * ax, sy * ay, sz * az], axis=-1)
    near_pi = axis_pi * theta[..., None]

    # w's direction is noise-dominated only when sin(theta) ~ fp32 noise
    use_pi = (sin_t < 1e-4) & (cos_t < 0.0)
    tiny = (sin_t < 1e-6) & (cos_t > 0.0)
    out = jnp.where(use_pi[..., None], near_pi, generic)
    return jnp.where(tiny[..., None], w * 0.5, out)


def pose_vec_to_w2c(pose6):
    """[..., 6] scene pose (rvec, tvec) -> [..., 4, 4] world-to-cam matrix."""
    R = rodrigues(pose6[..., 0:3])
    t = pose6[..., 3:6]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose6.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def w2c_to_pose_vec(T):
    """[..., 4, 4] world-to-cam -> [..., 6] scene pose (rvec, tvec)."""
    rvec = inverse_rodrigues(T[..., 0:3, 0:3])
    return jnp.concatenate([rvec, T[..., 0:3, 3]], axis=-1)


def invert_se3(T):
    """Invert a rigid 4x4 transform analytically (no linear solve)."""
    R = T[..., 0:3, 0:3]
    t = T[..., 0:3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, t_inv[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T, pts):
    """Apply [..., 4, 4] (or [..., 3, 4]) rigid transform to [..., N, 3] points."""
    R = T[..., 0:3, 0:3]
    t = T[..., 0:3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def rotation_angle_deg(R1, R2):
    """Relative rotation angle in degrees between two rotation matrices.

    Matches `utils/evaluation.py:121-132`: angle of R_est^T @ R_gt — the
    reference extracts it via f64 `cv2.Rodrigues`, whose axis-angle norm is
    sine-based and therefore precise for small angles. The naive
    arccos((trace-1)/2) in f32 has a ~0.02-0.04 deg quantization floor near
    zero (arccos resolution collapses at cos ~ 1), which round-2 metrics hit:
    every sub-0.05 deg error measured as exactly 0.0396 or 0. The
    atan2(|skew|/2, (trace-1)/2) form recovers Rodrigues-class precision
    (~1e-5 deg) from the same f32 matrices.

    The 3x3 product runs at full f32 precision: TPU's default matmul
    precision is bf16-class, which turns small relative rotations into
    ~0.1 deg of pure measurement noise in reported metrics.
    """
    Rrel = jnp.matmul(
        jnp.swapaxes(R1, -1, -2), R2, precision=jax.lax.Precision.HIGHEST)
    trace = Rrel[..., 0, 0] + Rrel[..., 1, 1] + Rrel[..., 2, 2]
    cos_t = (trace - 1.0) * 0.5
    sx = Rrel[..., 2, 1] - Rrel[..., 1, 2]
    sy = Rrel[..., 0, 2] - Rrel[..., 2, 0]
    sz = Rrel[..., 1, 0] - Rrel[..., 0, 1]
    sin_t = 0.5 * jnp.sqrt(sx * sx + sy * sy + sz * sz)
    return jnp.degrees(jnp.arctan2(sin_t, cos_t))


def orthonormalize(R, iters: int = 2):
    """Project a near-orthogonal matrix onto SO(3) via Newton iteration.

    R <- R (3I - R^T R) / 2, quadratic convergence for ||R^T R - I|| < 1.
    Branch-free; used to clean up P3P pose assembly under noise.
    """
    for _ in range(iters):
        R = 1.5 * R - 0.5 * (R @ jnp.swapaxes(R, -1, -2) @ R)
    return R
