"""Mesh construction and sharding policies (data / spatial parallelism)."""
from .mesh import batch_spec, make_mesh, replicate, shard_batch

__all__ = ["batch_spec", "make_mesh", "replicate", "shard_batch"]
