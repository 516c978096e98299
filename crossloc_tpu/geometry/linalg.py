"""Small fixed-size linear algebra, unrolled for TPU fusion.

`jnp.linalg.solve` on a 6x6 system lowers to pivoted LU — a while-loop +
dynamic-slice program XLA cannot fuse, dispatched as standalone kernels.
Inside the solver's refinement chain (`ransac/solver.py::_gn_refine`) that
solve runs ~30-40x *sequentially* per pose, so per-kernel latency dominates.
The damped Gauss-Newton normal matrix JtJ + diag(damp) is symmetric positive
definite, so an unrolled Cholesky — a static Python loop emitting pure
elementwise multiply-adds over the batch — solves the same system as one
fused kernel, with exact autodiff through every step (the DSAC expected-loss
backward differentiates through refinement, replacing
`dsacstar/dsacstar_derivative.h`).
"""
from __future__ import annotations

import jax.numpy as jnp


def solve_spd(A, b):
    """Solve A x = b for a small SPD system via unrolled Cholesky.

    A: [..., n, n] symmetric positive definite (n static, intended n<=8);
    b: [..., n]. Returns [..., n]. All operations are elementwise over the
    leading batch shape — under vmap/jit the whole solve fuses into the
    surrounding computation. Diagonal pivots are clamped to a tiny positive
    floor so a rank-deficient A yields finite (not NaN) output; callers that
    need a semantic guard keep their own isfinite firewall.
    """
    n = A.shape[-1]
    # L is a lower-triangular grid of [...]-shaped component arrays
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d[j]
    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_d[i]
    # back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_d[i]
    return jnp.stack(x, axis=-1)
