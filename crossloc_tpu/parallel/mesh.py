"""Device mesh + sharding helpers.

The reference has no multi-device support at all (SURVEY.md §2.3: single GPU
via CUDA_VISIBLE_DEVICES, OpenMP inside the plugin). The TPU-native design
scales with a 2-D `jax.sharding.Mesh`:

  * "data"    — batch dimension (data parallelism; XLA inserts the gradient
                all-reduce over ICI automatically),
  * "spatial" — image-height dimension (sequence/spatial parallelism for the
                conv tower; XLA SPMD inserts halo exchanges for 3x3 convs
                and cross-shard reductions for GroupNorm statistics).

Hypothesis parallelism (the analog of the plugin's OpenMP loop over 64
RANSAC hypotheses, `dsacstar.cpp:124`) lives *inside* each chip's program as
a vmapped axis; sharding it across chips is possible by annotating the
hypothesis axis with "spatial" but is not worthwhile at 64 hypotheses.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a ("data", "spatial") mesh. Defaults: all devices on "data"."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None:
        data = n // spatial
    if data * spatial != n:
        raise ValueError(f"mesh {data}x{spatial} != {n} devices")
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_spec(ndim: int, shard_spatial: bool = False) -> P:
    """PartitionSpec for an NHWC batch tensor: shard N over "data" and
    (optionally) H over "spatial"."""
    if ndim < 1:
        raise ValueError("batch arrays must have a leading batch dim")
    parts = ["data"] + ([None] * (ndim - 1))
    if shard_spatial and ndim >= 3:
        parts[1] = "spatial"
    return P(*parts)


def shard_batch(mesh: Mesh, tree, shard_spatial: bool = False):
    """Device-put a pytree of batch arrays with batch (and optionally
    height) sharding."""

    def put(x):
        spec = batch_spec(np.ndim(x), shard_spatial and np.ndim(x) >= 4)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters, optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
