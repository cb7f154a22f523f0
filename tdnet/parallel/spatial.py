"""Spatial partitioning: shard the image H axis over a 2-D (data, spatial) mesh.

The reference has no analog (its only parallelism is single-host in-graph
data parallelism — SURVEY.md §2.4); SURVEY.md §6 allowed stating the
sequence/spatial-parallel gap as deliberate. This module closes it the
TPU-native way instead: the detector's "long context" is its 800x1344
activation plane, and the TPU technique for it is GSPMD spatial
partitioning (as used by MLPerf-class TPU detection submissions) — shard
the H axis of every NHWC activation across a mesh axis and let XLA insert
halo exchanges for the convolution windows that straddle shard boundaries.

Why you'd use it: data parallelism cannot reduce the latency of ONE image,
and it cannot shrink per-chip activation memory at a fixed per-chip batch.
Sharding H over `spatial` devices divides both — the per-chip activation
footprint and the single-image latency floor — at the cost of halo traffic
over ICI (a few rows per conv per boundary; tiny next to the activation
planes themselves).

Design (everything rides GSPMD; no hand-written collectives):
- Mesh: 2-D ('data', 'spatial'). Batch axis shards over 'data' exactly as
  in parallel/mesh.py; H shards over 'spatial'.
- Inputs: images (NHWC float, NHWC uint8, or packed (B, H, W*3) uint8 —
  H is axis 1 in every convention) are placed with P('data', 'spatial');
  per-sample arrays (gt boxes/labels/masks, image_hw) with P('data').
- Model: RetinaNet(activation_sharding=activation_sharding(mesh)) pins the
  backbone taps and pyramid features to P('data', 'spatial') via
  with_sharding_constraint, so the partitioner keeps the whole conv trunk
  spatially sharded instead of gathering early. The (B, H*W*A, C) head
  flatten is where XLA all-gathers the spatial axis — the anchor-space
  tail (targets, losses, decode, NMS) is batch-sharded only.
- Gradients: the filter gradient of a spatially sharded conv needs a sum
  over shards; GSPMD inserts that psum over 'spatial' (and over 'data' for
  the batch) automatically. Params and optimizer state stay replicated.

The Pallas ingest/stem kernels are 1-D-data-mesh only (their shard_map
wrappers split just the batch axis; a spatially sharded input would be
silently recomputed per spatial shard) — train/step.py falls back to the
plain XLA normalize + stem under a spatial mesh, which GSPMD shards like
any other op. H is NOT required to divide the spatial axis: GSPMD pads
uneven shards internally (P7 at 800x1344 is 7 rows over up to 8 shards).

Scope note: this single-controller code path is exercised on the virtual
8-device CPU mesh (tests/parallel/test_spatial.py asserts numeric
equivalence against the single-device graph for forward, detections, and
one full train step) and compiles in dryrun_multichip; real-ICI profiling
needs a multi-chip slice (one chip here — the halo-exchange cost model
above is from the scaling-book recipe, not measured).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdnet.parallel.mesh import DATA_AXIS

__all__ = [
    "SPATIAL_AXIS",
    "create_spatial_mesh",
    "spatial_size",
    "image_sharding",
    "activation_sharding",
    "batch_shardings",
]

SPATIAL_AXIS = "spatial"


def create_spatial_mesh(
    n_spatial: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D (data, spatial) mesh: `n_spatial` devices along the spatial
    axis, the rest along data. n_spatial must divide the device count.

    With n_spatial == 1 this degenerates to the plain data mesh semantics
    (the spatial axis still exists, sized 1, so the same shardings apply).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_spatial < 1 or n % n_spatial:
        raise ValueError(
            f"spatial axis {n_spatial} must divide the {n} devices")
    grid = np.asarray(devices).reshape(n // n_spatial, n_spatial)
    return Mesh(grid, axis_names=(DATA_AXIS, SPATIAL_AXIS))


def spatial_size(mesh: Mesh) -> int:
    """Size of the spatial axis (1 when the mesh has none)."""
    return int(mesh.shape.get(SPATIAL_AXIS, 1))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Images: batch over 'data', H (axis 1 in NHWC / packed-rows / flat
    layouts alike) over 'spatial'."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def activation_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activations inside the model: same (batch, H) split."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def batch_shardings(keys, mesh: Mesh) -> dict:
    """Per-leaf shardings for a train batch dict: images spatially
    sharded, every per-sample array batch-sharded. `keys` is the batch's
    key set (a dict works too — it iterates its keys); the result matches
    the batch's structure so it can be passed to jax.device_put /
    make_global_batch."""
    img = image_sharding(mesh)
    data = NamedSharding(mesh, P(DATA_AXIS))
    return {k: (img if k == "images" else data) for k in keys}
