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

Layout: the whole pipeline is STRUCTURE-OF-ARRAYS — every vector/matrix is
a tuple of scalar component arrays of the batch shape, and the 4-candidate
axis is unrolled in Python. TPU vector tiles are (8 sublanes, 128 lanes) on
the two minor dims; the previous array-of-structures version kept dims of
3/4 minor-most, wasting ~97% of each tile and dominating the RANSAC
sampling phase (11.5 ms of a 16.5 ms solve at B=16 on v5e). In SoA form
every op runs on well-tiled [batch] arrays and XLA fuses the whole solver
into a few dense elementwise kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

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


# ---------------------------------------------------------------------------
# SoA vec3 / mat3 helpers. A vec3 is a tuple (x, y, z) of same-shape arrays;
# a sym3 is the 6-tuple (d00, d01, d02, d11, d12, d22); a mat3 is the 9-tuple
# (r00, r01, r02, r10, r11, r12, r20, r21, r22), row-major.
# ---------------------------------------------------------------------------


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _where3(c, a, b):
    return tuple(jnp.where(c, ai, bi) for ai, bi in zip(a, b))


def _normalize3(a):
    n = _safe_sqrt(_dot3(a, a))
    return _scale3(a, 1.0 / n)


def _sym_quad(D, v, w):
    """v^T D w for symmetric D (6-tuple)."""
    d00, d01, d02, d11, d12, d22 = D
    return (
        d00 * v[0] * w[0]
        + d11 * v[1] * w[1]
        + d22 * v[2] * w[2]
        + d01 * (v[0] * w[1] + v[1] * w[0])
        + d02 * (v[0] * w[2] + v[2] * w[0])
        + d12 * (v[1] * w[2] + v[2] * w[1])
    )


def _det_sym(D):
    d00, d01, d02, d11, d12, d22 = D
    return (
        d00 * (d11 * d22 - d12 * d12)
        - d01 * (d01 * d22 - d12 * d02)
        + d02 * (d01 * d12 - d11 * d02)
    )


def _mat3_vec(R, v):
    return (
        R[0] * v[0] + R[1] * v[1] + R[2] * v[2],
        R[3] * v[0] + R[4] * v[1] + R[5] * v[2],
        R[6] * v[0] + R[7] * v[1] + R[8] * v[2],
    )


def _mat3_mul(A, B):
    return (
        A[0] * B[0] + A[1] * B[3] + A[2] * B[6],
        A[0] * B[1] + A[1] * B[4] + A[2] * B[7],
        A[0] * B[2] + A[1] * B[5] + A[2] * B[8],
        A[3] * B[0] + A[4] * B[3] + A[5] * B[6],
        A[3] * B[1] + A[4] * B[4] + A[5] * B[7],
        A[3] * B[2] + A[4] * B[5] + A[5] * B[8],
        A[6] * B[0] + A[7] * B[3] + A[8] * B[6],
        A[6] * B[1] + A[7] * B[4] + A[8] * B[7],
        A[6] * B[2] + A[7] * B[5] + A[8] * B[8],
    )


def _mat3_Tmul(A, B):
    """A^T @ B."""
    return (
        A[0] * B[0] + A[3] * B[3] + A[6] * B[6],
        A[0] * B[1] + A[3] * B[4] + A[6] * B[7],
        A[0] * B[2] + A[3] * B[5] + A[6] * B[8],
        A[1] * B[0] + A[4] * B[3] + A[7] * B[6],
        A[1] * B[1] + A[4] * B[4] + A[7] * B[7],
        A[1] * B[2] + A[4] * B[5] + A[7] * B[8],
        A[2] * B[0] + A[5] * B[3] + A[8] * B[6],
        A[2] * B[1] + A[5] * B[4] + A[8] * B[7],
        A[2] * B[2] + A[5] * B[5] + A[8] * B[8],
    )


def _det9(R):
    return (
        R[0] * (R[4] * R[8] - R[5] * R[7])
        - R[1] * (R[3] * R[8] - R[5] * R[6])
        + R[2] * (R[3] * R[7] - R[4] * R[6])
    )


def _clip9(R, lo, hi):
    return tuple(jnp.clip(c, lo, hi) for c in R)


def _orthonormalize9(R, iters=2):
    """Newton iteration toward the orthogonal factor: R <- 1.5 R - 0.5 R R^T R
    (same scheme as geometry.se3.orthonormalize, componentwise)."""
    for _ in range(iters):
        RtR = _mat3_Tmul(R, R)
        RRtR = _mat3_mul(R, RtR)
        R = tuple(1.5 * r - 0.5 * s for r, s in zip(R, RRtR))
    return R


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


def _null_vec_sym(D, sigma):
    """Best-effort unit vector v with (D - sigma I) v ~= 0 for symmetric D.

    Picks the largest of the three row cross products — branch-free argmax.
    """
    d00, d01, d02, d11, d12, d22 = D
    r0 = (d00 - sigma, d01, d02)
    r1 = (d01, d11 - sigma, d12)
    r2 = (d02, d12, d22 - sigma)
    c01 = _cross3(r0, r1)
    c02 = _cross3(r0, r2)
    c12 = _cross3(r1, r2)
    n01 = _dot3(c01, c01)
    n02 = _dot3(c02, c02)
    n12 = _dot3(c12, c12)
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = jnp.logical_not(use01) & (n02 >= n12)
    v = _where3(use01, c01, _where3(use02, c02, c12))
    return _normalize3(v)


def _p3p_soa(x1, x2, x3, y1, y2, y3, dtype):
    """Lambda-Twist core on SoA inputs.

    x*/y*: vec3 tuples of [...] arrays (world points / unit bearings).
    Returns a list of 4 candidates (R mat3-tuple, t vec3-tuple, valid [...]).
    """
    b12 = _dot3(y1, y2)
    b13 = _dot3(y1, y3)
    b23 = _dot3(y2, y3)
    d12v = _sub3(x1, x2)
    d13v = _sub3(x1, x3)
    d23v = _sub3(x2, x3)
    a12 = _dot3(d12v, d12v)
    a13 = _dot3(d13v, d13v)
    a23 = _dot3(d23v, d23v)

    zeros = jnp.zeros_like(b12)

    # D1 = M12 a23 - M23 a12, D2 = M13 a23 - M23 a13 in closed form, where
    # M12 = [[1,-b12,0],[-b12,1,0],[0,0,0]], M13 = [[1,0,-b13],[0,0,0],
    # [-b13,0,1]], M23 = [[0,0,0],[0,1,-b23],[0,-b23,1]].
    D1 = (a23, -a23 * b12, zeros, a23 - a12, a12 * b23, -a12)
    D2 = (a23, zeros, -a23 * b13, -a13, a13 * b23, a23 - a13)

    # cubic coefficients of det(D1 + g D2) via evaluation at g in {0,1,-1,2}
    def d_at(g):
        return _det_sym(tuple(e1 + g * e2 for e1, e2 in zip(D1, D2)))

    d0 = _det_sym(D1)
    d1 = d_at(1.0)
    dm1 = d_at(-1.0)
    d2 = d_at(2.0)
    c0 = d0
    c2 = (d1 + dm1) / 2.0 - c0
    s1 = d1 - c2 - c0  # = c3 + c1
    s2 = d2 - 4.0 * c2 - c0  # = 8 c3 + 2 c1
    c3 = (s2 - 2.0 * s1) / 6.0
    c1 = s1 - c3

    gamma = _solve_cubic_real(c3, c2, c1, c0)
    D0 = tuple(e1 + gamma * e2 for e1, e2 in zip(D1, D2))

    # eigen decomposition of D0 with one (near-)zero eigenvalue
    tr = D0[0] + D0[3] + D0[5]
    minors = (
        D0[0] * D0[3]
        - D0[1] * D0[1]
        + D0[0] * D0[5]
        - D0[2] * D0[2]
        + D0[3] * D0[5]
        - D0[4] * D0[4]
    )
    disc = _safe_sqrt(tr * tr - 4.0 * minors)
    sigma1 = (tr + disc) * 0.5
    sigma2 = (tr - disc) * 0.5
    u1 = _null_vec_sym(D0, sigma1)
    u2 = _null_vec_sym(D0, sigma2)
    u3 = _null_vec_sym(D0, jnp.zeros_like(sigma1))
    sig_ok = (sigma1 > _EPS) & (sigma2 < -_EPS)
    s = _safe_sqrt(-sigma2 / jnp.maximum(sigma1, _EPS))

    # shared quadratic pieces: A tau^2 + B_k tau + C_k = 0 with
    # A = u3^T D1 u3 (candidate-independent)
    A = _sym_quad(D1, u3, u3)
    Asafe = jnp.where(jnp.abs(A) < _EPS, _EPS, A)

    candidates = []
    # four candidates: sign in {+s, -s} x quadratic root in {a, b}
    for sign, root_kind in ((1.0, 0), (1.0, 1), (-1.0, 0), (-1.0, 1)):
        w = tuple(sign * s * u1c + u2c for u1c, u2c in zip(u1, u2))
        Bq = 2.0 * _sym_quad(D1, w, u3)
        Cq = _sym_quad(D1, w, w)
        qdisc = Bq * Bq - 4.0 * A * Cq
        quad_ok = qdisc >= 0.0
        sq = _safe_sqrt(qdisc)
        # numerically stable roots: q = -(B + sign(B) sq)/2 -> q/A and C/q
        sgnB = jnp.where(Bq >= 0.0, 1.0, -1.0)
        qq = -(Bq + sgnB * sq) / 2.0
        qsafe = jnp.where(jnp.abs(qq) < _EPS, _EPS, qq)
        tau = qq / Asafe if root_kind == 0 else Cq / qsafe

        d = tuple(wc + tau * u3c for wc, u3c in zip(w, u3))

        # scale from the inhomogeneous constraint lambda^T M12 lambda = a12;
        # M12 quadratic form = dx^2 + dy^2 - 2 b12 dx dy
        dMd = d[0] * d[0] + d[1] * d[1] - 2.0 * b12 * d[0] * d[1]
        scale_ok = dMd > _EPS
        scale = _safe_sqrt(a12 / jnp.maximum(dMd, _EPS))
        lam = _scale3(d, scale)
        # flip so that lambda_1 > 0
        flip = jnp.where(lam[0] < 0.0, -1.0, 1.0)
        lam = _scale3(lam, flip)

        # Sanitize invalid candidates NOW: degenerate branches can carry huge
        # / non-finite lambdas whose downstream overflow (cross products,
        # Newton steps) produces NaN *gradients* even though the candidates
        # are masked out — a zero cotangent times a NaN partial is still NaN.
        # Depth bound: the supported scene domain caps depths at ~1e3 m (the
        # reference marks depth > 1000 invalid, `dataloader/dataloader.py:483`);
        # 3e4 leaves 30x headroom while keeping the polish algebra below the
        # fp32 overflow point (the adjugate solve scales like lambda^7).
        lam_sane = (
            jnp.isfinite(lam[0]) & jnp.isfinite(lam[1]) & jnp.isfinite(lam[2])
            & (lam[0] > _EPS) & (lam[1] > _EPS) & (lam[2] > _EPS)
            & (lam[0] < 3e4) & (lam[1] < 3e4) & (lam[2] < 3e4)
        )
        ones = jnp.ones_like(lam[0])
        lam = _where3(lam_sane, lam, (ones, ones, ones))

        # Gauss-Newton polish of the depth triplet (3 iterations, 3x3 solve,
        # explicit adjugate: LU backward emits NaN partials on near-singular
        # systems from degenerate candidates, poisoning the whole gradient)
        for _ in range(3):
            l1, l2, l3 = lam
            r1 = l1 * l1 + l2 * l2 - 2.0 * b12 * l1 * l2 - a12
            r2 = l1 * l1 + l3 * l3 - 2.0 * b13 * l1 * l3 - a13
            r3 = l2 * l2 + l3 * l3 - 2.0 * b23 * l2 * l3 - a23
            # J rows: [J11 J12 0; J21 0 J23; 0 J32 J33]
            J11 = 2.0 * l1 - 2.0 * b12 * l2
            J12 = 2.0 * l2 - 2.0 * b12 * l1
            J21 = 2.0 * l1 - 2.0 * b13 * l3
            J23 = 2.0 * l3 - 2.0 * b13 * l1
            J32 = 2.0 * l2 - 2.0 * b23 * l3
            J33 = 2.0 * l3 - 2.0 * b23 * l2
            # diagonal entries of J are (J11, 0, J33)
            damp = 1e-9 + 1e-6 * (J11 * J11 + J33 * J33)
            # JtJ (symmetric) with the zero pattern folded in
            g00 = J11 * J11 + J21 * J21 + damp
            g01 = J11 * J12
            g02 = J21 * J23
            g11 = J12 * J12 + J32 * J32 + damp
            g12 = J32 * J33
            g22 = J23 * J23 + J33 * J33 + damp
            h0 = J11 * r1 + J21 * r2
            h1 = J12 * r1 + J32 * r3
            h2 = J23 * r2 + J33 * r3
            G = (g00, g01, g02, g11, g12, g22)
            detG = _det_sym(G)
            solvable = jnp.abs(detG) > 1e-9
            det_s = jnp.where(solvable, detG, 1.0)
            # adjugate of the symmetric G (rows of inv * det)
            adj00 = g11 * g22 - g12 * g12
            adj01 = g02 * g12 - g01 * g22
            adj02 = g01 * g12 - g02 * g11
            adj11 = g00 * g22 - g02 * g02
            adj12 = g01 * g02 - g00 * g12
            adj22 = g00 * g11 - g01 * g01
            s0 = (adj00 * h0 + adj01 * h1 + adj02 * h2) / det_s
            s1_ = (adj01 * h0 + adj11 * h1 + adj12 * h2) / det_s
            s2_ = (adj02 * h0 + adj12 * h1 + adj22 * h2) / det_s
            ok = lam_sane & solvable
            lam = (
                jnp.where(ok, l1 - jnp.clip(s0, -1e4, 1e4), l1),
                jnp.where(ok, l2 - jnp.clip(s1_, -1e4, 1e4), l2),
                jnp.where(ok, l3 - jnp.clip(s2_, -1e4, 1e4), l3),
            )
            lam = tuple(jnp.clip(l, -3e4, 3e4) for l in lam)

        lam_ok = lam_sane & (lam[0] > _EPS) & (lam[1] > _EPS) & (lam[2] > _EPS)

        # pose assembly from camera-frame points z_i = lambda_i y_i
        zc1 = _scale3(y1, lam[0])
        zc2 = _scale3(y2, lam[1])
        zc3 = _scale3(y3, lam[2])
        z12 = _sub3(zc1, zc2)
        z13 = _sub3(zc1, zc3)
        zx = _cross3(z12, z13)

        xx = _cross3(d12v, d13v)
        # column matrix X = [d12v d13v xx]: det and adjugate rows
        detX = _dot3(d12v, _cross3(d13v, xx))
        geom_ok = jnp.abs(detX) > 1e-10
        det_safe = jnp.where(geom_ok, detX, 1.0)
        adj_r1 = _cross3(d13v, xx)  # row 1 of det * X^-1
        adj_r2 = _cross3(xx, d12v)
        adj_r3 = _cross3(d12v, d13v)
        # R = Z X^-1 = (z12 adj_r1 + z13 adj_r2 + zx adj_r3) / det, where
        # Z = [z12 z13 zx] (columns); outer-product accumulation, row-major
        inv_det = 1.0 / det_safe
        R = tuple(
            (z12[i] * adj_r1[j] + z13[i] * adj_r2[j] + zx[i] * adj_r3[j]) * inv_det
            for i in range(3)
            for j in range(3)
        )
        # valid rotations have entries in [-1, 1]; the clip only bites
        # degenerate candidates and keeps the Newton orthonormalization from
        # overflowing
        R = _clip9(R, -3.0, 3.0)
        R = _orthonormalize9(R, iters=2)
        # translation: average over the three correspondences
        tsum = (jnp.zeros_like(lam[0]), jnp.zeros_like(lam[0]), jnp.zeros_like(lam[0]))
        for zc, xw in ((zc1, x1), (zc2, x2), (zc3, x3)):
            Rx = _mat3_vec(R, xw)
            tsum = tuple(tc + (zcc - rxc) for tc, zcc, rxc in zip(tsum, zc, Rx))
        t = _scale3(tsum, 1.0 / 3.0)

        finite = jnp.ones_like(lam[0], dtype=bool)
        for comp in R + t:
            finite = finite & jnp.isfinite(comp)
        rot_ok = jnp.abs(_det9(R) - 1.0) < 0.1
        valid = sig_ok & quad_ok & scale_ok & lam_ok & geom_ok & finite & rot_ok
        candidates.append((R, t, valid))
    return candidates


def _unpack_vec3(arr, axis_idx):
    """[..., 3] components along the last axis of a [..., k, 3] slice."""
    return (arr[..., axis_idx, 0], arr[..., axis_idx, 1], arr[..., axis_idx, 2])


def p3p_lambdatwist(X, y):
    """Solve P3P: camera poses consistent with 3 world points and bearings.

    X: [..., 3, 3] world points (X[..., i, :] is point i).
    y: [..., 3, 3] unit bearing vectors in the camera frame.
    Returns (R [..., 4, 3, 3], t [..., 4, 3], valid [..., 4]) with
    x_cam = R x_world + t (w2c, OpenCV convention).
    """
    X = _grad_firewall(X)
    y = _grad_firewall(y)
    cands = _p3p_soa(
        _unpack_vec3(X, 0), _unpack_vec3(X, 1), _unpack_vec3(X, 2),
        _unpack_vec3(y, 0), _unpack_vec3(y, 1), _unpack_vec3(y, 2),
        X.dtype,
    )
    R = jnp.stack(
        [jnp.stack(c[0], axis=-1).reshape(c[0][0].shape + (3, 3)) for c in cands],
        axis=-3,
    )
    t = jnp.stack([jnp.stack(c[1], axis=-1) for c in cands], axis=-2)
    valid = jnp.stack([c[2] for c in cands], axis=-1)
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


def _p3p_from_4pts_impl(X4, pix4, cam_mat):
    """Pose from a 4-point minimal sample: P3P on points 0-2, point 3 selects.

    Mirrors the behavior of the reference sampler (`dsacstar_util.h:168-219`:
    OpenCV P3P consumes 4 points and uses the 4th for disambiguation; the
    sampler then checks all 4 reprojections against the inlier threshold).

    X4: [..., 4, 3] world points, pix4: [..., 4, 2] pixels, cam_mat [..., 3, 3].
    Returns (R [..., 3, 3], t [..., 3], max_err4 [...], valid [...]).
    SoA end to end: candidate scoring, 4th-point disambiguation and the
    winner selection all run on scalar component arrays.
    """
    fx = cam_mat[..., 0, 0]
    fy = cam_mat[..., 1, 1]
    cx = cam_mat[..., 0, 2]
    cy = cam_mat[..., 1, 2]

    # bearings for the 3 solver points, componentwise
    def bearing(i):
        bx = (pix4[..., i, 0] - cx) / fx
        by = (pix4[..., i, 1] - cy) / fy
        bz = jnp.ones_like(bx)
        inv_n = 1.0 / _safe_sqrt(bx * bx + by * by + bz)
        return (bx * inv_n, by * inv_n, bz * inv_n)

    xs = [_unpack_vec3(X4, i) for i in range(4)]
    cands = _p3p_soa(xs[0], xs[1], xs[2], bearing(0), bearing(1), bearing(2), X4.dtype)

    # reprojection error of all 4 points under each candidate; keep the best
    inf = jnp.full_like(cands[0][2], jnp.inf, dtype=X4.dtype)
    best_err = inf
    best_R = cands[0][0]
    best_t = cands[0][1]
    any_valid = jnp.zeros_like(cands[0][2])
    for R, t, valid in cands:
        max_err = jnp.zeros_like(best_err)
        infront = jnp.ones_like(valid)
        for i in range(4):
            u = tuple(uc + tc for uc, tc in zip(_mat3_vec(R, xs[i]), t))
            infront = infront & (u[2] > 1e-6)
            z = jnp.maximum(u[2], 1e-6)
            ex = fx * u[0] / z + cx - pix4[..., i, 0]
            ey = fy * u[1] / z + cy - pix4[..., i, 1]
            max_err = jnp.maximum(max_err, _safe_sqrt(ex * ex + ey * ey))
        valid = valid & infront
        err = jnp.where(valid, max_err, jnp.inf)
        better = err < best_err
        best_err = jnp.where(better, err, best_err)
        best_R = tuple(jnp.where(better, rn, rb) for rn, rb in zip(R, best_R))
        best_t = tuple(jnp.where(better, tn, tb) for tn, tb in zip(t, best_t))
        any_valid = any_valid | valid

    R_best = jnp.stack(best_R, axis=-1).reshape(best_R[0].shape + (3, 3))
    t_best = jnp.stack(best_t, axis=-1)
    return R_best, t_best, best_err, any_valid


@jax.custom_vjp
def p3p_from_4pts(X4, pix4, cam_mat):
    """`_p3p_from_4pts_impl` with an implicit-function-theorem backward.

    Reverse- (and even forward-) differentiating the unrolled Lambda-Twist
    algebra produces graphs XLA's CPU backend cannot compile in reasonable
    time (hours for an 8-hypothesis training step). The returned pose is
    instead differentiated implicitly: (R, t) satisfies the 3-point
    projection system F(pose, X) = 0 exactly, so
    d pose / dX = -(dF/dpose)^-1 dF/dX with F a six-equation projection —
    a tiny graph, one 6x6 solve, exact gradients for the selected root.
    This replaces the reference's finite-difference `dPNP` Jacobian at the
    same boundary (`dsacstar_derivative.h:131-188`); cotangents are
    sanitized like its jacobian clamping (`dsacstar.cpp:411-412`). The 4th
    (disambiguation) point and `err4` feed only threshold comparisons
    downstream and carry no gradient.
    """
    return _p3p_from_4pts_impl(X4, pix4, cam_mat)


def _p3p4_fwd(X4, pix4, cam_mat):
    out = _p3p_from_4pts_impl(X4, pix4, cam_mat)
    R, t, _, valid = out
    return out, (X4, pix4, cam_mat, R, t, valid)


def _p3p4_bwd(res, g):
    from .se3 import rodrigues as _rodrigues, inverse_rodrigues as _inv_rodrigues

    X4, pix4, cam_mat, R, t, valid = res
    gR, gt, _, _ = g

    lead = X4.shape[:-2]
    M = 1
    for d in lead:
        M *= d
    X3 = X4.reshape(M, 4, 3)[:, :3, :]
    pix3 = pix4.reshape(M, 4, 2)[:, :3, :]
    Km = jnp.broadcast_to(cam_mat, lead + (3, 3)).reshape(M, 3, 3)
    Rm = R.reshape(M, 3, 3)
    tm = t.reshape(M, 3)
    gRm = gR.reshape(M, 3, 3)
    gtm = gt.reshape(M, 3)
    vm = valid.reshape(M)

    def one(X3i, pix3i, Ki, Ri, ti, gRi, gti):
        rvec = _inv_rodrigues(Ri)
        p6 = jnp.concatenate([rvec, ti])

        def F(p6_, X9_):
            Rr = _rodrigues(p6_[0:3])
            Xc = X9_.reshape(3, 3) @ Rr.T + p6_[3:6]
            z = jnp.maximum(Xc[:, 2], 1e-9)
            u = Ki[0, 0] * Xc[:, 0] / z + Ki[0, 2] - pix3i[:, 0]
            v = Ki[1, 1] * Xc[:, 1] / z + Ki[1, 2] - pix3i[:, 1]
            return jnp.concatenate([u, v])

        X9 = X3i.reshape(9)
        A = jax.jacfwd(F, argnums=0)(p6, X9)  # [6, 6]
        Bm = jax.jacfwd(F, argnums=1)(p6, X9)  # [6, 9]
        # cotangent in pose6 space: g_p6 = [sum_ij gR dR/dr, gt]
        dRdr = jax.jacfwd(_rodrigues)(rvec)  # [3, 3, 3] (out_ij, r_k)
        g_r = jnp.einsum("ij,ijk->k", gRi, dRdr)
        g_p6 = jnp.concatenate([g_r, gti])
        # dpose/dX = -A^-1 B  =>  gX = -B^T A^-T g_p6
        y = jnp.linalg.solve(A.T, g_p6)
        return -(Bm.T @ y)  # [9]

    gX3 = jax.vmap(one)(X3, pix3, Km, Rm, tm, gRm, gtm)
    gX3 = jnp.where(vm[:, None], gX3, 0.0)
    gX3 = jnp.where(jnp.isfinite(gX3), gX3, 0.0)  # grad firewall
    gX3 = jnp.clip(gX3, -1e6, 1e6)
    gX4 = jnp.concatenate(
        [gX3.reshape(M, 3, 3), jnp.zeros((M, 1, 3), gX3.dtype)], axis=1
    ).reshape(X4.shape)
    return gX4, jnp.zeros_like(pix4), jnp.zeros_like(cam_mat)


p3p_from_4pts.defvjp(_p3p4_fwd, _p3p4_bwd)
