"""Mesh construction and sharding policies (data / spatial parallelism),
plus multi-host scaffolding (`jax.distributed`)."""
from .distributed import (
    global_batch_from_local,
    initialize_distributed,
    local_data_shard,
    make_global_mesh,
)
from .mesh import (
    batch_spec,
    gather_tree,
    make_mesh,
    param_spec,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_spec",
    "gather_tree",
    "global_batch_from_local",
    "initialize_distributed",
    "local_data_shard",
    "make_global_mesh",
    "make_mesh",
    "param_spec",
    "replicate",
    "shard_batch",
    "shard_params",
]
