"""Pallas TPU kernel: tiled greedy NMS.

The device-side NMS the north star calls for (BASELINE.json:5 "box decoding
and per-level NMS move ... into a Pallas top-k/NMS kernel so inference never
leaves the device"). Replaces the reference's tf.map_fn +
tf.image.non_max_suppression serialization (SURVEY.md §4.2 latency sink).

Algorithm (the TPU-friendly tiled formulation, cf. TF's
non_max_suppression_padded):
  - candidates arrive score-sorted (host of the sort is a cheap lax.top_k
    outside the kernel) in a transposed (4, K) layout so box coordinates sit
    along the 128-lane axis;
  - the grid walks (batch, tile): for each 128-box tile, first resolve
    intra-tile suppression by iterating the parallel self-suppression sweep
    to its fixpoint (== exact greedy NMS within the tile), then broadcast
    the tile's survivors against ALL later boxes in one (T, K) IoU and clear
    their keep bits;
  - the running keep mask lives in VMEM scratch and persists across the
    sequential grid steps; suppression flows strictly forward (high score ->
    low score), so each tile's bits are final when its step ends.

Cost: K^2/T sequential steps of (T, K) vector work — for K=1024 that is 8
steps of 128x1024 VPU ops over a ~0.5 MB working set, entirely in VMEM.

Exact-greedy equivalence with ops/nms.py non_max_suppression is enforced by
tests (CPU interpret mode) and is the contract: `use_pallas=True` in
filter_detections must never change results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_nms_keep",
    "pallas_nms_keep_rows",
    "pallas_nms_keep_auto",
    "nms_keep_sorted",
]

# Measured-best kernel formulation for product call sites (ops/nms.py)
# — see tools/perf_nms_rows.py; TDNET_NMS_KERNEL=tiled|rows overrides at
# trace time. Both are exact-equivalent by contract (tested).
DEFAULT_KERNEL = "tiled"


def pallas_nms_keep_auto(boxes, valid, iou_threshold=0.5, interpret=False):
    """Dispatch to the configured NMS kernel formulation (same contract as
    :func:`pallas_nms_keep`)."""
    import os

    impl = os.environ.get("TDNET_NMS_KERNEL", DEFAULT_KERNEL)
    fn = pallas_nms_keep_rows if impl == "rows" else pallas_nms_keep
    return fn(boxes, valid, iou_threshold=iou_threshold, interpret=interpret)

TILE = 128


def _pairwise_iou_tk(tb, ab):
    """IoU between a (4, T) tile and (4, K) all-boxes -> (T, K) float32.

    Row vectors (1, N) broadcast against column vectors (T, 1) so every
    intermediate stays 2-D (TPU-friendly layouts). Exact continuous IoU
    (tf.image.non_max_suppression convention)."""
    tx1 = tb[0:1, :].T  # (T, 1)
    ty1 = tb[1:2, :].T
    tx2 = tb[2:3, :].T
    ty2 = tb[3:4, :].T
    ax1 = ab[0:1, :]  # (1, K)
    ay1 = ab[1:2, :]
    ax2 = ab[2:3, :]
    ay2 = ab[3:4, :]

    iw = jnp.maximum(jnp.minimum(tx2, ax2) - jnp.maximum(tx1, ax1), 0.0)
    ih = jnp.maximum(jnp.minimum(ty2, ay2) - jnp.maximum(ty1, ay1), 0.0)
    inter = iw * ih
    area_t = (tx2 - tx1) * (ty2 - ty1)  # (T, 1)
    area_a = (ax2 - ax1) * (ay2 - ay1)  # (1, K)
    union = area_t + area_a - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


def _nms_kernel(boxes_ref, valid_ref, keep_ref, keep_scratch, *, iou_threshold, num_tiles):
    """One (batch, tile) grid step. Block shapes: boxes (1, 4, K);
    valid/keep (1, 1, K); scratch (1, K) int32, persists across tiles."""
    i = pl.program_id(1)
    k = boxes_ref.shape[2]
    start = i * TILE

    @pl.when(i == 0)
    def _():
        keep_scratch[0:1, :] = valid_ref[0, 0:1, :]

    all_boxes = boxes_ref[0]  # (4, K)
    tile_boxes = boxes_ref[0, :, pl.ds(start, TILE)]  # (4, T)

    # ---- intra-tile: parallel self-suppression sweeps to fixpoint
    iou_tt = _pairwise_iou_tk(tile_boxes, tile_boxes)  # (T, T)
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    supp_tt = ((iou_tt > iou_threshold) & (row < col)).astype(jnp.int32)

    valid_tile = keep_scratch[0:1, pl.ds(start, TILE)]  # (1, T) int32

    def not_converged(carry):
        keep, prev = carry
        return jnp.any(keep != prev)

    def sweep(carry):
        keep, _prev = carry  # (1, T)
        # box j survives iff no kept higher-scored i suppresses it
        hit = jnp.max(supp_tt * keep.T, axis=0, keepdims=True)  # (1, T)
        return (valid_tile * (1 - hit), keep)

    first = valid_tile * (
        1 - jnp.max(supp_tt * valid_tile.T, axis=0, keepdims=True)
    )
    tile_keep, _ = jax.lax.while_loop(not_converged, sweep, (first, valid_tile))
    keep_scratch[0:1, pl.ds(start, TILE)] = tile_keep

    # ---- forward propagation: survivors suppress all later boxes
    iou_tk = _pairwise_iou_tk(tile_boxes, all_boxes)  # (T, K)
    later = jax.lax.broadcasted_iota(jnp.int32, (TILE, k), 1) >= (start + TILE)
    hits = (iou_tk > iou_threshold) & later & (tile_keep.T > 0)
    suppressed = jnp.max(hits.astype(jnp.int32), axis=0, keepdims=True)  # (1, K)
    keep_scratch[0:1, :] = keep_scratch[0:1, :] * (1 - suppressed)

    @pl.when(i == num_tiles - 1)
    def _():
        keep_ref[0, 0:1, :] = keep_scratch[0:1, :]


ROW_TILE = 4  # batch rows per grid step in the row-batched kernel


def _nms_kernel_rows(boxes_ref, valid_ref, keep_ref, keep_scratch, *,
                     iou_threshold, num_tiles):
    """ROW_TILE batch rows per grid step; tiles walked by an in-kernel
    fori_loop. Identical math to _nms_kernel, restructured so one kernel
    invocation does a whole row-block's NMS: at batch 128 / K 1024 the
    (batch, tile) grid runs 1024 steps whose blocks never change between
    tile steps — this form runs B/ROW_TILE steps and keeps everything in
    VMEM/registers across the tile walk. Per-row compute stays 2-D
    (Mosaic-friendly); the row loop is unrolled (ROW_TILE independent
    pipelines per step)."""
    r = boxes_ref.shape[0]
    k = boxes_ref.shape[2]

    keep_scratch[...] = valid_ref[:, 0, :]

    def tile_step(ti, _):
        start = ti * TILE
        for ri in range(r):  # unrolled: 2-D ops only
            all_boxes = boxes_ref[ri]  # (4, K)
            tile_boxes = boxes_ref[ri, :, pl.ds(start, TILE)]  # (4, T)

            iou_tt = _pairwise_iou_tk(tile_boxes, tile_boxes)  # (T, T)
            row = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
            supp_tt = ((iou_tt > iou_threshold) & (row < col)).astype(jnp.int32)

            valid_tile = keep_scratch[ri:ri + 1, pl.ds(start, TILE)]  # (1, T)

            def not_converged(carry):
                keep, prev = carry
                return jnp.any(keep != prev)

            def sweep(carry):
                keep, _prev = carry  # (1, T)
                hit = jnp.max(supp_tt * keep.T, axis=0, keepdims=True)
                return (valid_tile * (1 - hit), keep)

            first = valid_tile * (
                1 - jnp.max(supp_tt * valid_tile.T, axis=0, keepdims=True)
            )
            tile_keep, _ = jax.lax.while_loop(
                not_converged, sweep, (first, valid_tile))
            keep_scratch[ri:ri + 1, pl.ds(start, TILE)] = tile_keep

            iou_tk = _pairwise_iou_tk(tile_boxes, all_boxes)  # (T, K)
            later = jax.lax.broadcasted_iota(
                jnp.int32, (TILE, k), 1) >= (start + TILE)
            hits = (iou_tk > iou_threshold) & later & (tile_keep.T > 0)
            suppressed = jnp.max(hits.astype(jnp.int32), axis=0,
                                 keepdims=True)  # (1, K)
            keep_scratch[ri:ri + 1, :] = (
                keep_scratch[ri:ri + 1, :] * (1 - suppressed))
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_step, 0)
    keep_ref[...] = keep_scratch[...][:, None, :]


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_keep_rows(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row-batched variant of :func:`pallas_nms_keep` (same contract:
    score-sorted (B, K, 4) boxes + (B, K) valid -> (B, K) keep, exact
    greedy NMS). Pads B to a multiple of ROW_TILE with valid=False rows."""
    b, k, _ = boxes.shape
    if k % TILE != 0:
        raise ValueError(f"K={k} must be a multiple of {TILE}")
    pad_b = (-b) % ROW_TILE
    if pad_b:
        boxes = jnp.pad(boxes, ((0, pad_b), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, pad_b), (0, 0)))
    bp = b + pad_b
    num_tiles = k // TILE

    boxes_t = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)  # (B, 4, K)
    valid_i = valid.astype(jnp.int32)[:, None, :]  # (B, 1, K)

    kernel = functools.partial(
        _nms_kernel_rows, iou_threshold=iou_threshold, num_tiles=num_tiles
    )
    keep = pl.pallas_call(
        kernel,
        grid=(bp // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, 4, k), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1, k), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, 1, k), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ROW_TILE, k), jnp.int32)],
        interpret=interpret,
    )(boxes_t, valid_i)
    return keep[:b, 0, :].astype(bool)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_keep(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask for SCORE-SORTED boxes.

    boxes: (B, K, 4) float32, sorted by descending score per batch row.
    valid: (B, K) bool — candidate mask (below-threshold slots already False).
    Returns keep: (B, K) bool. K must be a multiple of 128 (pad with
    valid=False slots).
    """
    b, k, _ = boxes.shape
    if k % TILE != 0:
        raise ValueError(f"K={k} must be a multiple of {TILE}")
    num_tiles = k // TILE

    boxes_t = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)  # (B, 4, K)
    valid_i = valid.astype(jnp.int32)[:, None, :]  # (B, 1, K)

    kernel = functools.partial(
        _nms_kernel, iou_threshold=iou_threshold, num_tiles=num_tiles
    )
    keep = pl.pallas_call(
        kernel,
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.int32)],
        interpret=interpret,
    )(boxes_t, valid_i)
    return keep[:, 0, :].astype(bool)


def nms_keep_sorted(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    score_threshold: float = float("-inf"),
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-image convenience wrapper matching ops/nms.non_max_suppression:
    unsorted (N, 4)/(N,) in, keep mask in ORIGINAL order out. N must be a
    multiple of 128."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores, stable=True)
    sboxes = jnp.take(boxes, order, axis=0)
    sscores = jnp.take(scores, order)
    valid = sscores > score_threshold

    keep_sorted = pallas_nms_keep(
        sboxes[None], valid[None], iou_threshold=iou_threshold, interpret=interpret
    )[0]
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)
