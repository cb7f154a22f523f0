"""Parallelism: mesh construction and sharding policy."""

from tdnet.parallel.mesh import (
    batch_sharding,
    create_mesh,
    initialize_distributed,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "initialize_distributed",
    "replicated_sharding",
    "shard_batch",
]
