"""Weighted Kabsch (orthogonal Procrustes) alignment via SVD, pure jnp.

TPU-native replacement for the reference's hand-rolled Kabsch + analytic
SVD gradients (`dsacstar/dsacstar_util_rgbd.h:237-458`): `jnp.linalg.svd`
is differentiable in JAX, so the ~480 lines of C++ Jacobian code vanish.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _grad_firewall(x):
    """Identity forward; backward replaces non-finite cotangents with 0 and
    clamps magnitude. jnp.linalg.svd's backward is NaN for repeated /
    degenerate singular values (e.g. duplicate points in a 3-point minimal
    set); the reference detects that case and falls back to finite
    differences (`dsacstar_util_rgbd.h:410-458`) — dropping those gradients
    is the autodiff-native equivalent."""
    return x


def _fw_fwd(x):
    return x, None


def _fw_bwd(_, g):
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    return (jnp.clip(g, -1e6, 1e6),)


_grad_firewall.defvjp(_fw_fwd, _fw_bwd)


def kabsch(src, dst, weights=None):
    """Find rigid (R, t) minimizing sum_i w_i ||R src_i + t - dst_i||^2.

    src, dst: [..., N, 3]; weights: [..., N] (optional, nonneg).
    Returns (R [..., 3, 3], t [..., 3]).

    Handedness correction via sign(det) matches the reference
    (`dsacstar_util_rgbd.h:237-387`, standard Kabsch).
    """
    src = _grad_firewall(src)
    dst = _grad_firewall(dst)
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    wn = weights / wsum  # [..., N]

    src_c = jnp.sum(wn[..., None] * src, axis=-2)  # [..., 3]
    dst_c = jnp.sum(wn[..., None] * dst, axis=-2)
    src0 = src - src_c[..., None, :]
    dst0 = dst - dst_c[..., None, :]

    # covariance H = sum w_i dst0_i src0_i^T  -> R = U diag(1,1,det) V^T
    H = jnp.einsum("...n,...ni,...nj->...ij", wn, dst0, src0)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.zeros_like(H).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(det)
    R = U @ D @ Vt
    t = dst_c - jnp.einsum("...ij,...j->...i", R, src_c)
    return R, t
