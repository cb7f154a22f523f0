"""Parallelism: mesh construction and sharding policy.

Four axes: data (mesh.py), spatial — the image H axis (spatial.py), and
tensor — conv output channels + Adam moments (tensor.py) are all
GSPMD-placement-driven (no hand-written collectives); pipeline
(pipeline.py) is a GPipe-style 2-stage split (backbone | FPN+heads) with
per-stage jitted programs and a 1F1B microbatch schedule.
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
