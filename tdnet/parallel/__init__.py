"""Parallelism: mesh construction and sharding policy.

Three axes, all GSPMD-placement-driven (no hand-written collectives):
data (mesh.py), spatial — the image H axis (spatial.py), and tensor —
conv output channels + Adam moments (tensor.py).
"""

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
