"""Multi-host (multi-process) scaffolding over `jax.distributed`.

The reference is strictly single-GPU (SURVEY.md §2.3 — no torch.distributed
anywhere); this module is the TPU-native scale-out path beyond one host.

Topology guidance (DCN mesh shape)
----------------------------------
On a multi-host TPU deployment the mesh must be laid out so that the only
traffic crossing DCN (the slow host-to-host network) is the once-per-step
gradient all-reduce, while everything chatty rides ICI:

  * "data"    — OUTERMOST axis, split across processes/slices first. Each
                host computes on its own batch shard; DCN carries only the
                psum of gradients (~30 MB for this ~30M-param model).
  * "spatial" — innermost axis, always within one host's ICI domain. The
                3x3-conv halo exchanges and GroupNorm stat reductions it
                induces happen every layer and must never touch DCN.

`make_global_mesh` encodes exactly that: devices are ordered
process-major (jax.devices() already is), so reshaping to
(data, spatial) puts "spatial" groups within a process whenever
spatial <= local_device_count.

Launch contract
---------------
One process per host, all running the same CLI. On Cloud TPU,
`jax.distributed.initialize()` auto-discovers the coordinator from the TPU
metadata; elsewhere set either the standard JAX env vars or ours:

  CROSSLOC_COORDINATOR = host:port of process 0   (JAX_COORDINATOR_ADDRESS)
  CROSSLOC_NUM_PROCESSES = total process count    (JAX_NUM_PROCESSES)
  CROSSLOC_PROCESS_ID = this process's rank       (JAX_PROCESS_ID)

`initialize_distributed()` is called by the training CLIs before first
device use; with none of the above set (and not on Cloud TPU) it is a
no-op, so single-host behavior is unchanged.

Single-process CI covers everything except the real DCN transport: env
parsing, idempotence, mesh layout, and per-host batch assembly
(`tests/test_train.py::TestDistributed`). The transport itself is JAX's.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np

from .mesh import make_mesh

_initialized = False


def _env(*names: str) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Connect this process to the multi-host job, if one is configured.

    Explicit arguments win over CROSSLOC_*/JAX_* env vars. Returns True when
    `jax.distributed.initialize` was (or already had been) called, False for
    the single-process no-op. Idempotent: safe to call from every CLI.
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = coordinator_address or _env(
        "CROSSLOC_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        v = _env("CROSSLOC_NUM_PROCESSES", "JAX_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = _env("CROSSLOC_PROCESS_ID", "JAX_PROCESS_ID")
        process_id = int(v) if v else None

    if coordinator_address is None and num_processes is None and process_id is None:
        # Not configured. (On Cloud TPU pods jax.distributed.initialize()
        # would auto-discover, but implicit multi-host init from a plain
        # training command is surprising — require explicit env.)
        return False
    missing = [name for name, val in (
        ("coordinator (CROSSLOC_COORDINATOR / JAX_COORDINATOR_ADDRESS)", coordinator_address),
        ("process count (CROSSLOC_NUM_PROCESSES / JAX_NUM_PROCESSES)", num_processes),
        ("process id (CROSSLOC_PROCESS_ID / JAX_PROCESS_ID)", process_id),
    ) if val is None]
    if missing:
        # A partial configuration would reach jax.distributed.initialize with
        # incomplete arguments and hang (or die opaquely) instead of telling
        # the user what is unset.
        raise ValueError(
            "incomplete multi-host configuration: set all of coordinator/"
            "num_processes/process_id together; missing: " + "; ".join(missing))

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logging.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count())
    return True


def make_global_mesh(data: Optional[int] = None, spatial: int = 1):
    """("data", "spatial") mesh over ALL processes' devices.

    jax.devices() orders devices process-major, so with
    spatial <= jax.local_device_count() each "spatial" group stays inside
    one host (ICI) and only the "data" axis spans DCN — see module
    docstring. Raises if a spatial group would straddle hosts.
    """
    local = jax.local_device_count()
    if jax.process_count() > 1 and spatial > local:
        raise ValueError(
            f"spatial={spatial} > {local} local devices: halo exchanges would "
            "cross DCN; shard the batch ('data') across hosts instead")
    return make_mesh(jax.devices(), data=data, spatial=spatial)


def global_batch_from_local(mesh, tree, shard_spatial: bool = False):
    """Assemble globally-sharded arrays from each process's LOCAL batch shard.

    Multi-host feeding contract: every process loads only its own
    1/process_count of the global batch (disjoint file ranges — see
    `data.pipeline.Loader(shard=...)`) and calls this with that local tree;
    the result is a global jax.Array of batch size
    local_batch * process_count, sharded over the mesh. Single-process it
    degenerates to `shard_batch`.
    """
    from .mesh import batch_spec
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:  # scalars (e.g. focal) are replicated
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = batch_spec(x.ndim, shard_spatial and x.ndim >= 4)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(put, tree)


def local_data_shard() -> tuple:
    """(shard_index, num_shards) this process should read from the dataset."""
    return jax.process_index(), jax.process_count()
