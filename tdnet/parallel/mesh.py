"""Mesh + sharding policy — the single module every collective rides through.

The reference's only parallelism is single-host in-graph data parallelism
(keras multi_gpu_model; SURVEY.md §2.4). The TPU-native design: a 1-D
'data' mesh axis under GSPMD — params replicated, batches sharded on their
leading axis — with gradient all-reduce inserted automatically by XLA over
ICI. Centralizing the shardings here means single-chip, a v5e pod slice, and
multi-host DCN (jax.distributed.initialize + the same NamedShardings) are
the same code path (SURVEY.md §6 "Distributed comm backend").

A ResNet-50 detector rarely NEEDS more than data parallelism — weights and
optimizer state fit comfortably per chip; scaling is by batch. Both other
axes ARE provided for deployments where batch scaling is not the
bottleneck: parallel/spatial.py shards the 800x1344 activation plane (the
sequence-parallel analog; 2-D (data, spatial) mesh, GSPMD halo exchange,
train `--spatial S`), and parallel/tensor.py shards the conv weights'
output channels plus their Adam moments (Megatron-style column
parallelism; 2-D (data, model) mesh, train `--tensor-parallel M`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_global_batch",
    "initialize_distributed",
    "process_allgather_rows",
]

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op single-host). Wraps
    jax.distributed.initialize so CLIs stay backend-agnostic."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (global) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with every array batch-sharded on 'data'."""
    return jax.device_put(batch, batch_sharding(mesh))


def make_global_batch(batch, sharding) -> dict:
    """Assemble a PROCESS-LOCAL host batch into globally sharded arrays.

    Single-process this is plain device_put; multi-host, each process
    contributes its local shard (its slice of the per-host sharded dataset —
    data/generator.py) and the result is a global jax.Array spanning the
    mesh, so the same pjit train step works on 1 chip, a v5e slice, and a
    multi-host DCN deployment (SURVEY.md §2.4/§6)."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    if isinstance(sharding, jax.sharding.Sharding):
        sharding = jax.tree_util.tree_map(lambda _: sharding, batch)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch,
        sharding,
    )


def process_allgather_rows(rows: np.ndarray) -> np.ndarray:
    """All-gather a host-side (n_local, d) array across processes along
    axis 0 (n_local may differ per process). Single-process: returns the
    input unchanged. Used by the sharded evaluator (utils/eval.py) to
    collect per-image detection rows; the result is identical on every
    process, so no broadcast step is needed afterwards.

    Implementation: pad the ragged axis to the global max, one
    multihost_utils.process_allgather of the padded block + one of the
    counts, then strip padding per process (rank-ordered). The block is
    transported as raw BYTES: with x64 disabled (the default), a float64
    array fed to jax would be silently downcast to f32 — viewing as uint8
    keeps every dtype bit-exact through the collective."""
    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils

    rows = np.ascontiguousarray(rows)
    n_local = rows.shape[0]
    counts = multihost_utils.process_allgather(
        np.asarray([n_local], np.int32))  # (P,) or (P,1)
    counts = np.asarray(counts).reshape(-1)
    n_max = int(counts.max())
    if n_max == 0:
        return rows
    pad = np.zeros((n_max - n_local,) + rows.shape[1:], rows.dtype)
    block = np.concatenate([rows, pad], axis=0)
    as_bytes = np.ascontiguousarray(block).view(np.uint8).reshape(n_max, -1)
    gathered = np.asarray(
        multihost_utils.process_allgather(as_bytes), np.uint8
    ).reshape(len(counts), n_max, -1)  # (P, n_max, rowbytes)
    out = [
        gathered[p, : counts[p]].reshape(-1).view(rows.dtype).reshape(
            (counts[p],) + rows.shape[1:])
        for p in range(len(counts))
    ]
    return np.concatenate(out, axis=0)
