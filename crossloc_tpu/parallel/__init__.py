"""Mesh construction and sharding policies (data / spatial parallelism),
plus multi-host scaffolding (`jax.distributed`)."""
from .distributed import (
    global_batch_from_local,
    initialize_distributed,
    local_data_shard,
    make_global_mesh,
)
from .mesh import batch_spec, make_mesh, replicate, shard_batch

__all__ = [
    "batch_spec",
    "global_batch_from_local",
    "initialize_distributed",
    "local_data_shard",
    "make_global_mesh",
    "make_mesh",
    "replicate",
    "shard_batch",
]
