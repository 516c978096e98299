"""Fused GroupNorm(+ReLU) Pallas kernel (NHWC).

The TransPose nets apply GroupNorm after every conv (`networks/networks.py`);
at the /8 feature resolution that is 13+ multi-megabyte normalization passes
per forward. XLA cannot fuse the cross-(H,W,group) statistics into the conv
epilogue, so each flax GN costs ~3 HBM passes. This kernel computes
statistics and applies normalize(+ReLU) in ONE VMEM-resident pass per batch
element; group reductions ride the MXU via a channels->groups one-hot
matmul (no awkward lane reshapes).

Backward runs through a pure-jnp reference implementation via custom_vjp
(recompute; correctness over cleverness), so the kernel is safe in training.
Falls back to the jnp path when a block would not fit VMEM or when shapes
are not TPU-tileable.

Measured on v5e (BENCH_NOTES.md): standalone the kernel beats the unfused
flax GroupNorm+ReLU by 1.4x, but *inside the full network* the opaque
pallas_call blocks XLA's producer/consumer fusion with the surrounding convs
and the end-to-end step gets ~8% slower. The kernel is therefore OFF by
default (`set_pallas_enabled(True)` to opt in); the default path is the
fusion-friendly pure-jnp implementation. Kept as the scaffold for a future
conv-epilogue-fused kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_VMEM_BUDGET_BYTES = 10 * 1024 * 1024
_PALLAS_ENABLED = False


def set_pallas_enabled(enabled: bool) -> None:
    """Globally opt in/out of the Pallas GroupNorm kernel."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(enabled)


def _gn_reference(x, scale, bias, num_groups: int, eps: float, relu: bool):
    """Pure-jnp GroupNorm(+ReLU), fp32 statistics — semantics identical to
    flax.linen.GroupNorm (contiguous channel groups, like torch)."""
    B, H, W, C = x.shape
    gs = C // num_groups
    xf = x.astype(jnp.float32).reshape(B, H * W, num_groups, gs)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 3), keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = xn.reshape(B, H, W, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, gmat_ref, o_ref, *, num_groups, gs, eps, relu):
    x = x_ref[0].astype(jnp.float32)  # [H, W, C]
    H, W, C = x.shape
    n = H * W * gs

    s1 = jnp.sum(x, axis=(0, 1))  # [C]
    s2 = jnp.sum(x * x, axis=(0, 1))  # [C]
    gmat = gmat_ref[:]  # [C, G] one-hot group membership
    s1g = jnp.dot(s1[None, :], gmat, preferred_element_type=jnp.float32)[0]  # [G]
    s2g = jnp.dot(s2[None, :], gmat, preferred_element_type=jnp.float32)[0]
    mu = s1g / n
    var = s2g / n - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    # broadcast group stats back to channels: [C, G] @ [G]
    mu_c = jnp.dot(gmat, mu[:, None], preferred_element_type=jnp.float32)[:, 0]
    inv_c = jnp.dot(gmat, inv[:, None], preferred_element_type=jnp.float32)[:, 0]

    y = (x - mu_c) * (inv_c * scale_ref[0].astype(jnp.float32)) + bias_ref[0].astype(
        jnp.float32
    )
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_forward(x, scale, bias, num_groups: int, eps: float, relu: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    gs = C // num_groups
    gmat = jnp.asarray(
        np.kron(np.eye(num_groups, dtype=np.float32), np.ones((gs, 1), np.float32))
    )  # [C, G]

    kernel = partial(_kernel, num_groups=num_groups, gs=gs, eps=eps, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, num_groups), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, scale.reshape(1, C), bias.reshape(1, C), gmat)


def _eligible(x, num_groups: int) -> bool:
    if not _PALLAS_ENABLED:
        return False
    if jax.default_backend() != "tpu":
        return False  # Pallas TPU kernels don't lower on CPU/GPU backends
    B, H, W, C = x.shape
    if C % num_groups != 0 or C % 128 != 0:
        return False
    itemsize = jnp.dtype(x.dtype).itemsize
    # input block + fp32 working copy + output block must fit in VMEM
    block = H * W * C * (itemsize * 2 + 4)
    return block <= _VMEM_BUDGET_BYTES


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_relu(x, scale, bias, num_groups: int = 32, eps: float = 1e-6, relu: bool = True):
    """Fused GroupNorm(+ReLU), NHWC. Differentiable (recompute backward)."""
    return _forward_impl(x, scale, bias, num_groups, eps, relu)


def _forward_impl(x, scale, bias, num_groups, eps, relu):
    if scale.shape[-1] != x.shape[-1] or bias.shape[-1] != x.shape[-1]:
        raise ValueError(
            f"scale/bias of {scale.shape}/{bias.shape} do not match channels {x.shape[-1]}"
        )
    if _eligible(x, num_groups):
        return _pallas_forward(x, scale, bias, num_groups, eps, relu)
    return _gn_reference(x, scale, bias, num_groups, eps, relu)


def _fwd(x, scale, bias, num_groups, eps, relu):
    return _forward_impl(x, scale, bias, num_groups, eps, relu), (x, scale, bias)


def _bwd(num_groups, eps, relu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, s, b: _gn_reference(a, s, b, num_groups, eps, relu), x, scale, bias)
    return vjp(g)


groupnorm_relu.defvjp(_fwd, _bwd)
