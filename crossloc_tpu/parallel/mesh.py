"""Device mesh + sharding helpers.

The reference has no multi-device support at all (SURVEY.md §2.3: single GPU
via CUDA_VISIBLE_DEVICES, OpenMP inside the plugin). The TPU-native design
scales with a 2-D `jax.sharding.Mesh`:

  * "data"    — batch dimension (data parallelism; XLA inserts the gradient
                all-reduce over ICI automatically),
  * "spatial" — image-height dimension (sequence/spatial parallelism for the
                conv tower; XLA SPMD inserts halo exchanges for 3x3 convs
                and cross-shard reductions for GroupNorm statistics),
  * "model"   — optional axis (parameter sharding, FSDP/ZeRO-style): conv
                kernels and their bias/GroupNorm vectors are sharded over
                out-channels (`param_spec`), and the batch N dim spans
                ("data", "model") (`shard_batch`), so weights AND Adam
                moments live sharded while XLA GSPMD inserts the per-layer
                weight all-gathers. GN groups stay shard-local (32 groups,
                and the mesh sizes used divide 32, so every group's
                channels land on one shard). The model is ~30M params, so
                parameter sharding is never needed for memory (SURVEY.md
                §2.3 deems TP out of scope for parity) — this is a
                correctness-tested capability for scaling experiments, not
                a default.

"model" cannot be combined with "spatial" (make_mesh raises): jax/jaxlib
0.9.0 MISCOMPILES conv gradients on meshes that mix height sharding with
out-channel parameter sharding — measured on the full network, stem/early
res-block weight gradients come out 4x or with essentially random per-leaf
scale factors while the forward loss stays exact, under BOTH the Shardy and
classic-GSPMD partitioners. `tools/xla_convgrad_repro.py` is the
single-conv distillation of the same partitioner defect family: any mesh
axis unspanned by a spatially-sharded conv's operands mis-scales its weight
gradient by the unused axis size (and an out-channel-sharded kernel there
corrupts even the forward). Revisit the guard on a jax upgrade by rerunning
the repro + tests/test_train.py::TestShardingEquivalence. On supported
meshes, `shard_batch` always spans every mesh axis with the batch N dim
(("data", "model")), which both sidesteps the unspanned-axis defect and is
the better sharding (replicating the batch over an axis would leave its
chips recomputing identical activations).

Hypothesis parallelism (the analog of the plugin's OpenMP loop over 64
RANSAC hypotheses, `dsacstar.cpp:124`) lives *inside* each chip's program as
a vmapped axis; sharding it across chips is possible by annotating the
hypothesis axis with "spatial" but is not worthwhile at 64 hypotheses.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    spatial: int = 1,
    model: int = 1,
) -> Mesh:
    """Build a ("data", "spatial") or ("data", "spatial"=1, "model") mesh.

    Defaults: all devices on "data". The "model" axis is only materialized
    when model > 1 (with a size-1 "spatial" axis so specs naming "spatial"
    still resolve); spatial>1 with model>1 raises — jax 0.9.0 miscompiles
    that combination (module docstring).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if spatial > 1 and model > 1:
        raise ValueError(
            "spatial and model axes cannot be combined: jax 0.9.0 XLA SPMD "
            "miscompiles conv gradients when image height and parameter "
            "out-channels are both sharded (see parallel/mesh.py docstring "
            "and tools/xla_convgrad_repro.py)"
        )
    if data is None:
        data = n // (spatial * model)
    if data * spatial * model != n:
        raise ValueError(f"mesh {data}x{spatial}x{model} != {n} devices")
    if model > 1:
        arr = np.asarray(devices).reshape(data, 1, model)
        return Mesh(arr, axis_names=("data", "spatial", "model"))
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_spec(ndim: int, shard_spatial: bool = False, shard_model: bool = False) -> P:
    """PartitionSpec for an NHWC batch tensor: shard N over "data" (and
    over ("data", "model") on 3-axis meshes — the batch must span EVERY
    mesh axis, see the module docstring on the XLA conv-grad miscompile)
    and optionally H over "spatial"."""
    if ndim < 1:
        raise ValueError("batch arrays must have a leading batch dim")
    parts = [("data", "model") if shard_model else "data"] + ([None] * (ndim - 1))
    if shard_spatial and ndim >= 3:
        parts[1] = "spatial"
    return P(*parts)


def shard_batch(mesh: Mesh, tree, shard_spatial: bool = False):
    """Device-put a pytree of batch arrays with batch (and optionally
    height) sharding; scalar leaves replicate. On a mesh with a "model"
    axis the batch N dim spans ("data", "model") so no mesh axis is left
    unspanned by the data (required — see the module docstring). A
    "spatial" axis of size > 1 likewise must be spanned: shard_spatial is
    mandatory there, otherwise the layout lands in the same jax 0.9.0
    conv-grad miscompile class `make_mesh` guards against."""
    shard_model = "model" in mesh.axis_names
    if not shard_spatial and dict(mesh.shape).get("spatial", 1) > 1:
        raise ValueError(
            "shard_batch on a mesh with a spatial axis of size > 1 requires "
            "shard_spatial=True: leaving the 'spatial' axis unspanned by "
            "both conv operands is the jax 0.9.0 XLA SPMD conv-grad "
            "miscompile class (see parallel/mesh.py docstring and "
            "tools/xla_convgrad_repro.py)"
        )

    def put(x):
        if np.ndim(x) == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = batch_spec(np.ndim(x), shard_spatial and np.ndim(x) >= 4, shard_model)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters, optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


@functools.lru_cache(maxsize=8)
def _gather_fn(mesh: Mesh):
    # one jit wrapper per mesh (a single out_shardings leaf broadcasts over
    # the whole output pytree), so repeated epoch saves reuse the compiled
    # identity-gather program instead of re-tracing a fresh lambda each call
    return jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))


def gather_tree(mesh: Mesh, tree):
    """Re-replicate a (possibly parameter-sharded) pytree on device: a jit
    identity with fully-replicated out_shardings, so XLA inserts the
    all-gathers. Needed before host pulls of ZeRO-sharded state in
    multi-process runs, where `jax.device_get` on an array sharded across
    processes is not fully addressable; on replicated input it is a no-op
    copy."""
    return _gather_fn(mesh)(tree)


def param_spec(tree, model: int, axis: str = "model"):
    """PartitionSpecs for parameter sharding: shard each parameter's
    out-channel (trailing) axis over the "model" mesh axis.

    The network is all NHWC convs: kernels are HWIO and biases/GroupNorm
    vectors are [C], so the trailing axis is out-channels everywhere. A leaf
    is sharded only when its channel count is a multiple of 32 — that keeps
    GroupNorm's 32 groups shard-local (group size C/32 divides the shard
    size C/model whenever model divides 32, which is validated) — so every
    tower width (32..512) shards while the 4-channel head and the [3]
    scene-mean replicate. Works on any pytree whose leaves are arrays
    (params, Adam moments); scalar leaves replicate.
    """
    if 32 % model != 0:
        raise ValueError(f"{axis}={model} must divide 32 (GroupNorm groups)")

    def spec(x):
        shape = np.shape(x)
        if shape and shape[-1] % 32 == 0:
            return P(*([None] * (len(shape) - 1) + [axis]))
        return P()

    return jax.tree_util.tree_map(spec, tree)


def shard_params(mesh: Mesh, tree, axis: str = "model"):
    """Device-put params / optimizer state with out-channel sharding over
    the given mesh axis (falls back to full replication when the mesh lacks
    the axis or it has size 1). With the batch spanning that same axis
    (`shard_batch` on "model" meshes; the batch's own "data" axis for
    ZeRO-over-DP, axis="data" — the train CLI's --zero), XLA GSPMD inserts
    the per-layer weight all-gathers — FSDP/ZeRO-style parameter +
    optimizer-state sharding."""
    model = dict(mesh.shape).get(axis, 1)
    if model == 1:
        return replicate(mesh, tree)
    specs = param_spec(tree, model, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )
