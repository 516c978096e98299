"""Closed-form P3P (Lambda-Twist) in pure jnp — static shapes, vmappable.

This is the TPU-native replacement for the reference's hypothesis sampler,
which calls OpenCV `solvePnP(SOLVEPNP_P3P)` on 4 sampled points inside an
OpenMP loop with unbounded retries (`dsacstar/dsacstar_util.h:135-221`).
Here a single closed-form solver returns all (<=4) candidate poses at once;
the 4th point disambiguates, and rejection happens by masking instead of
retry loops — everything is fixed-shape so XLA can fuse and batch it.

Algorithm: Persson & Nordberg, "Lambda Twist: An Accurate Fast Robust P3P
Solver" (ECCV 2018) — depths from a cubic + constrained eigen decomposition,
Gauss-Newton polish on the depth triplet, closed-form pose assembly.
Implemented from the paper's math; no code ported.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import orthonormalize

_EPS = 1e-12


def _safe_sqrt(x, eps=1e-12):
    """sqrt with finite gradient everywhere (sqrt' blows up at 0, and a
    clamped-to-zero argument under `where` poisons autodiff with NaN)."""
    return jnp.sqrt(jnp.maximum(x, eps))


def _safe_cbrt(x, eps=1e-12):
    """Signed cube root with zero (not inf) gradient in the dead zone."""
    ax = jnp.maximum(jnp.abs(x), eps)
    return jnp.sign(x) * ax ** (1.0 / 3.0)


@jax.custom_vjp
def _grad_firewall(x):
    """Identity forward; backward sanitizes cotangents: non-finite -> 0,
    magnitude clamped. Degenerate minimal sets carry no useful gradient
    signal, and the reference's hand-written backward does the same thing —
    it zeroes unstable jacobians (`dsacstar.cpp:411-412`,
    `dsacstar_derivative.h:288`)."""
    return x


def _firewall_fwd(x):
    return x, None


def _firewall_bwd(_, g):
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    return (jnp.clip(g, -1e6, 1e6),)


_grad_firewall.defvjp(_firewall_fwd, _firewall_bwd)


def _det3(A):
    """Explicit 3x3 determinant (cofactor expansion). jnp.linalg.det's VJP
    is det(A) inv(A)^T = 0 * inf = NaN for singular matrices — guaranteed to
    occur when a minimal set samples duplicate points."""
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


def _solve_cubic_real(c3, c2, c1, c0):
    """One real root of c3 x^3 + c2 x^2 + c1 x + c0, branch-free.

    Uses the trigonometric method for the 3-real-root case and the Cardano
    (cbrt) form otherwise, then 3 Newton polish steps on the raw cubic.
    All inputs broadcast.
    """
    c3s = jnp.where(jnp.abs(c3) < _EPS, jnp.where(c3 < 0, -_EPS, _EPS), c3)
    a = c2 / c3s
    b = c1 / c3s
    c = c0 / c3s
    # depressed cubic t^3 + p t + q, x = t - a/3
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + c
    disc = (q * q) / 4.0 + (p**3) / 27.0

    # Cardano branch (disc > 0): one real root
    sq = _safe_sqrt(disc)
    t_card = _safe_cbrt(-q / 2.0 + sq) + _safe_cbrt(-q / 2.0 - sq)

    # trig branch (disc <= 0, p < 0): three real roots; take k=0
    pm = jnp.minimum(p, -_EPS)
    r = jnp.sqrt(-pm / 3.0)
    arg = jnp.clip(3.0 * q / (2.0 * pm) * jnp.sqrt(-3.0 / pm), -1.0 + 1e-7, 1.0 - 1e-7)
    t_trig = 2.0 * r * jnp.cos(jnp.arccos(arg) / 3.0)

    t = jnp.where(disc > 0.0, t_card, t_trig)
    x = t - a / 3.0

    # Newton polish on the original (un-normalized) cubic
    for _ in range(3):
        f = ((c3 * x + c2) * x + c1) * x + c0
        df = (3.0 * c3 * x + 2.0 * c2) * x + c1
        df = jnp.where(jnp.abs(df) < _EPS, _EPS, df)
        x = x - f / df
    return x


def _null_like_eigvec(A):
    """Best-effort unit vector v with A v ~= 0 for (near-)singular symmetric A.

    Picks the largest of the three row cross products — branch-free argmax.
    """
    r0, r1, r2 = A[..., 0, :], A[..., 1, :], A[..., 2, :]
    cands = jnp.stack(
        [jnp.cross(r0, r1), jnp.cross(r0, r2), jnp.cross(r1, r2)], axis=-2
    )  # [..., 3, 3]
    norms = _safe_sqrt(jnp.sum(cands * cands, axis=-1))  # [..., 3]
    idx = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, idx[..., None, None].repeat(3, axis=-1), axis=-2)[..., 0, :]
    n = _safe_sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / n


def _eig3x3_known0(D0):
    """Eigen decomposition of symmetric 3x3 with one (near-)zero eigenvalue.

    Returns (sigma1, sigma2, u1, u2, u3) with sigma1 >= sigma2 the nonzero
    eigenvalues and u3 the null direction.
    """
    tr = D0[..., 0, 0] + D0[..., 1, 1] + D0[..., 2, 2]
    # sum of principal 2x2 minors
    m = (
        D0[..., 0, 0] * D0[..., 1, 1]
        - D0[..., 0, 1] * D0[..., 1, 0]
        + D0[..., 0, 0] * D0[..., 2, 2]
        - D0[..., 0, 2] * D0[..., 2, 0]
        + D0[..., 1, 1] * D0[..., 2, 2]
        - D0[..., 1, 2] * D0[..., 2, 1]
    )
    disc = _safe_sqrt(tr * tr - 4.0 * m)
    sigma1 = (tr + disc) * 0.5
    sigma2 = (tr - disc) * 0.5
    eye = jnp.eye(3, dtype=D0.dtype)
    u1 = _null_like_eigvec(D0 - sigma1[..., None, None] * eye)
    u2 = _null_like_eigvec(D0 - sigma2[..., None, None] * eye)
    u3 = _null_like_eigvec(D0)
    return sigma1, sigma2, u1, u2, u3


def _quad_dot(M, v):
    """v^T M v for [..., 3, 3] and [..., 3]."""
    return jnp.einsum("...i,...ij,...j->...", v, M, v)


def p3p_lambdatwist(X, y):
    """Solve P3P: camera poses consistent with 3 world points and bearings.

    X: [..., 3, 3] world points (X[..., i, :] is point i).
    y: [..., 3, 3] unit bearing vectors in the camera frame.
    Returns (R [..., 4, 3, 3], t [..., 4, 3], valid [..., 4]) with
    x_cam = R x_world + t (w2c, OpenCV convention).
    """
    dtype = X.dtype
    X = _grad_firewall(X)
    y = _grad_firewall(y)
    x1, x2, x3 = X[..., 0, :], X[..., 1, :], X[..., 2, :]
    y1, y2, y3 = y[..., 0, :], y[..., 1, :], y[..., 2, :]

    b12 = jnp.sum(y1 * y2, axis=-1)
    b13 = jnp.sum(y1 * y3, axis=-1)
    b23 = jnp.sum(y2 * y3, axis=-1)
    a12 = jnp.sum((x1 - x2) ** 2, axis=-1)
    a13 = jnp.sum((x1 - x3) ** 2, axis=-1)
    a23 = jnp.sum((x2 - x3) ** 2, axis=-1)

    zeros = jnp.zeros_like(b12)
    ones = jnp.ones_like(b12)

    def sym3(d00, d01, d02, d11, d12, d22):
        row0 = jnp.stack([d00, d01, d02], axis=-1)
        row1 = jnp.stack([d01, d11, d12], axis=-1)
        row2 = jnp.stack([d02, d12, d22], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)

    M12 = sym3(ones, -b12, zeros, ones, zeros, zeros)
    M13 = sym3(ones, zeros, -b13, zeros, zeros, ones)
    M23 = sym3(zeros, zeros, zeros, ones, -b23, ones)

    D1 = M12 * a23[..., None, None] - M23 * a12[..., None, None]
    D2 = M13 * a23[..., None, None] - M23 * a13[..., None, None]

    # cubic coefficients of det(D1 + g D2) via evaluation at g in {0,1,-1,2}
    d0 = _det3(D1)
    d1 = _det3(D1 + D2)
    dm1 = _det3(D1 - D2)
    d2 = _det3(D1 + 2.0 * D2)
    c0 = d0
    c2 = (d1 + dm1) / 2.0 - c0
    # d1 = c3 + c2 + c1 + c0 ; d2 = 8 c3 + 4 c2 + 2 c1 + c0
    s1 = d1 - c2 - c0  # = c3 + c1
    s2 = d2 - 4.0 * c2 - c0  # = 8 c3 + 2 c1
    c3 = (s2 - 2.0 * s1) / 6.0
    c1 = s1 - c3

    gamma = _solve_cubic_real(c3, c2, c1, c0)
    D0 = D1 + gamma[..., None, None] * D2

    sigma1, sigma2, u1, u2, u3 = _eig3x3_known0(D0)
    sig_ok = (sigma1 > _EPS) & (sigma2 < -_EPS)
    s = _safe_sqrt(-sigma2 / jnp.maximum(sigma1, _EPS))

    # four candidates: sign in {+, -} x quadratic root in {0, 1}
    signs = jnp.stack([s, s, -s, -s], axis=-1)  # [..., 4]
    w = signs[..., None] * u1[..., None, :] + u2[..., None, :]  # [..., 4, 3]

    A = _quad_dot(D1, u3)[..., None]  # [..., 1] -> broadcast
    B = 2.0 * jnp.einsum("...ki,...ij,...j->...k", w, D1, u3)  # [..., 4]
    C = jnp.einsum("...ki,...ij,...kj->...k", w, D1, w)  # [..., 4]

    qdisc = B * B - 4.0 * A * C  # [..., 4]
    quad_ok = qdisc >= 0.0
    sq = _safe_sqrt(qdisc)
    # numerically stable roots: q = -(B + sign(B)*sq)/2 -> roots q/A and C/q
    sgnB = jnp.where(B >= 0.0, 1.0, -1.0)
    qq = -(B + sgnB * sq) / 2.0
    Asafe = jnp.where(jnp.abs(A) < _EPS, _EPS, A)
    qsafe = jnp.where(jnp.abs(qq) < _EPS, _EPS, qq)
    root_a = qq / Asafe
    root_b = C / qsafe
    tau = jnp.stack([root_a[..., 0], root_b[..., 1], root_a[..., 2], root_b[..., 3]], axis=-1)

    d = w + tau[..., None] * u3[..., None, :]  # [..., 4, 3]

    # scale from the inhomogeneous constraint lambda^T M12 lambda = a12
    dMd = jnp.einsum("...ki,...ij,...kj->...k", d, M12, d)  # [..., 4]
    scale_ok = dMd > _EPS
    scale = _safe_sqrt(a12[..., None] / jnp.maximum(dMd, _EPS))
    lam = d * scale[..., None]
    # flip so that lambda_1 > 0
    lam = lam * jnp.where(lam[..., 0:1] < 0.0, -1.0, 1.0)

    # Sanitize invalid candidates NOW: degenerate branches can carry huge /
    # non-finite lambdas whose downstream overflow (cross products, Newton
    # steps) produces NaN *gradients* even though the candidates are masked
    # out — a zero cotangent times a NaN partial is still NaN. Replacing the
    # triplet keeps every forward value (and thus every partial) finite.
    # Depth bound: the supported scene domain caps depths at ~1e3 m (the
    # reference marks depth > 1000 invalid, `dataloader/dataloader.py:483`);
    # 3e4 leaves 30x headroom while keeping the polish algebra below the
    # fp32 overflow point (the adjugate solve scales like lambda^7).
    lam_sane = (
        jnp.all(jnp.isfinite(lam), axis=-1)
        & jnp.all(lam > _EPS, axis=-1)
        & jnp.all(lam < 3e4, axis=-1)
    )
    lam = jnp.where(lam_sane[..., None], lam, 1.0)

    # Gauss-Newton polish of the depth triplet (3 iterations, 3x3 solve)
    b12e, b13e, b23e = b12[..., None], b13[..., None], b23[..., None]
    a12e, a13e, a23e = a12[..., None], a13[..., None], a23[..., None]
    for _ in range(3):
        l1, l2, l3 = lam[..., 0], lam[..., 1], lam[..., 2]
        r1 = l1 * l1 + l2 * l2 - 2.0 * b12e * l1 * l2 - a12e
        r2 = l1 * l1 + l3 * l3 - 2.0 * b13e * l1 * l3 - a13e
        r3 = l2 * l2 + l3 * l3 - 2.0 * b23e * l2 * l3 - a23e
        res = jnp.stack([r1, r2, r3], axis=-1)  # [..., 4, 3]
        z = jnp.zeros_like(l1)
        J = jnp.stack(
            [
                jnp.stack([2 * l1 - 2 * b12e * l2, 2 * l2 - 2 * b12e * l1, z], axis=-1),
                jnp.stack([2 * l1 - 2 * b13e * l3, z, 2 * l3 - 2 * b13e * l1], axis=-1),
                jnp.stack([z, 2 * l2 - 2 * b23e * l3, 2 * l3 - 2 * b23e * l2], axis=-1),
            ],
            axis=-2,
        )  # [..., 4, 3, 3]
        damp = 1e-9 + 1e-6 * (
            J[..., 0, 0] ** 2 + J[..., 1, 1] ** 2 + J[..., 2, 2] ** 2
        )
        JtJ = jnp.einsum("...ki,...kj->...ij", J, J) + damp[..., None, None] * jnp.eye(
            3, dtype=dtype
        )
        Jtr = jnp.einsum("...ki,...k->...i", J, res)
        # explicit adjugate solve: jnp.linalg.solve's LU backward emits NaN
        # partials on (near-)singular systems from degenerate candidates,
        # which poison the whole gradient even though those candidates are
        # masked out downstream (0 * NaN = NaN in the VJP)
        detJ = _det3(JtJ)
        r0, r1, r2 = JtJ[..., 0, :], JtJ[..., 1, :], JtJ[..., 2, :]
        adjT = jnp.stack(
            [jnp.cross(r1, r2), jnp.cross(r2, r0), jnp.cross(r0, r1)], axis=-1
        )  # = adj(JtJ) for symmetric JtJ
        solvable = jnp.abs(detJ) > 1e-9
        det_s = jnp.where(solvable, detJ, 1.0)
        step = jnp.einsum("...ij,...j->...i", adjT, Jtr) / det_s[..., None]
        step = jnp.clip(step, -1e4, 1e4)
        lam = jnp.where((lam_sane & solvable)[..., None], lam - step, lam)
        lam = jnp.clip(lam, -3e4, 3e4)

    lam = jnp.clip(lam, -3e4, 3e4)  # polish may still step far on bad sets
    lam_ok = lam_sane & jnp.all(lam > _EPS, axis=-1)

    # pose assembly from camera-frame points z_i = lambda_i y_i
    zc = lam[..., :, None] * y[..., None, :, :]  # [..., 4, 3, 3] rows = points
    z12 = zc[..., 0, :] - zc[..., 1, :]
    z13 = zc[..., 0, :] - zc[..., 2, :]
    zx = jnp.cross(z12, z13)
    Zm = jnp.stack([z12, z13, zx], axis=-1)  # [..., 4, 3, 3] columns

    x12 = (x1 - x2)[..., None, :]
    x13 = (x1 - x3)[..., None, :]
    xx = jnp.cross(x12, x13)
    Xm = jnp.stack(
        [jnp.broadcast_to(x12, zx.shape), jnp.broadcast_to(x13, zx.shape), jnp.broadcast_to(xx, zx.shape)],
        axis=-1,
    )  # [..., 4, 3, 3] columns

    detX = _det3(Xm)
    geom_ok = jnp.abs(detX) > 1e-10
    Xm_safe = jnp.where(geom_ok[..., None, None], Xm, jnp.eye(3, dtype=dtype))
    adj = jnp.stack(
        [
            jnp.cross(Xm_safe[..., :, 1], Xm_safe[..., :, 2], axis=-1),
            jnp.cross(Xm_safe[..., :, 2], Xm_safe[..., :, 0], axis=-1),
            jnp.cross(Xm_safe[..., :, 0], Xm_safe[..., :, 1], axis=-1),
        ],
        axis=-2,
    )  # rows of inv * det (adjugate of the column matrix)
    det_safe = jnp.where(geom_ok, detX, 1.0)
    R = Zm @ (adj / det_safe[..., None, None])
    # valid rotations have entries in [-1, 1]; the clip only bites degenerate
    # candidates and keeps the Newton orthonormalization from overflowing
    R = jnp.clip(R, -3.0, 3.0)
    R = orthonormalize(R, iters=2)
    # translation: average over the three correspondences
    t = jnp.mean(zc - jnp.einsum("...ij,...nj->...ni", R, X[..., None, :, :]), axis=-2)

    finite = jnp.all(jnp.isfinite(R), axis=(-1, -2)) & jnp.all(jnp.isfinite(t), axis=-1)
    rot_ok = jnp.abs(_det3(R) - 1.0) < 0.1
    valid = sig_ok[..., None] & quad_ok & scale_ok & lam_ok & geom_ok & finite & rot_ok
    return R, t, valid


def bearings_from_pixels(pixels, cam_mat):
    """Unit bearing vectors from pixel coords. [..., N, 2] -> [..., N, 3]."""
    f = cam_mat[..., 0, 0]
    cx = cam_mat[..., 0, 2]
    cy = cam_mat[..., 1, 2]
    x = (pixels[..., 0] - cx[..., None]) / f[..., None]
    y = (pixels[..., 1] - cy[..., None]) / f[..., None]
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return v / _safe_sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def p3p_from_4pts(X4, pix4, cam_mat):
    """Pose from a 4-point minimal sample: P3P on points 0-2, point 3 selects.

    Mirrors the behavior of the reference sampler (`dsacstar_util.h:168-219`:
    OpenCV P3P consumes 4 points and uses the 4th for disambiguation; the
    sampler then checks all 4 reprojections against the inlier threshold).

    X4: [..., 4, 3] world points, pix4: [..., 4, 2] pixels, cam_mat [..., 3, 3].
    Returns (R [..., 3, 3], t [..., 3], max_err4 [...], valid [...]).
    """
    y = bearings_from_pixels(pix4[..., 0:3, :], cam_mat)
    R, t, valid = p3p_lambdatwist(X4[..., 0:3, :], y)  # [..., 4, ...]

    # reprojection error of all 4 points under each candidate
    Xc = jnp.einsum("...kij,...nj->...kni", R, X4) + t[..., :, None, :]  # [..., 4cand, 4pt, 3]
    z = Xc[..., 2:3]
    behind = jnp.any(Xc[..., 2] <= 1e-6, axis=-1)
    proj = jnp.einsum("...ij,...knj->...kni", cam_mat, Xc)
    proj = proj[..., 0:2] / jnp.maximum(proj[..., 2:3], 1e-6)
    diff = proj - pix4[..., None, :, :]
    err = _safe_sqrt(jnp.sum(diff * diff, axis=-1))  # [..., 4cand, 4pt]
    max_err = jnp.max(err, axis=-1)  # [..., 4cand]
    valid = valid & ~behind
    max_err = jnp.where(valid, max_err, jnp.inf)

    best = jnp.argmin(max_err, axis=-1)
    take = lambda arr: jnp.take_along_axis(
        arr, best[(...,) + (None,) * (arr.ndim - best.ndim)], axis=best.ndim
    ).squeeze(best.ndim)
    R_best = take(R)
    t_best = take(t)
    err_best = jnp.take_along_axis(max_err, best[..., None], axis=-1)[..., 0]
    any_valid = jnp.any(valid, axis=-1)
    return R_best, t_best, err_best, any_valid
