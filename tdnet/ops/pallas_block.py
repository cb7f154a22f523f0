"""Fused ResNet bottleneck Pallas kernels (VMEM-resident residual blocks).

Replaces the graph segment of a RUN of D consecutive IDENTITY bottleneck
blocks (each: conv1x1 C->M, BN, ReLU; conv3x3 s1 SAME M->M, BN, ReLU;
conv1x1 M->C, BN; +residual; ReLU) with ONE kernel in which every
intermediate — the two M-channel tensors of every block AND the C-channel
activations BETWEEN blocks — lives only in VMEM.

Why (PERF.md round-5 "backbone conv program"): the round-4 verdict's one
open perf item was an estimated 15-25% of backbone headroom behind XLA's
conv emitter at the stride-1 bottleneck shapes. Measured reality (batch
32, 800x1344, bf16, tools/perf_block.py):
- ISOLATED identity blocks: this kernel beats the XLA lowering ~2x
  (stage2 11.7 -> 5.9 ms, stage3 5.8 -> 2.8 ms), bit-exact.
- IN-GRAPH, single-block swaps net ~0: XLA's inter-op pipelining hides
  most of what its emitter loses per-block, while each pallas_call is a
  scheduling barrier. The remaining wins are (a) fusing the WHOLE
  identity run so the C-channel inter-block round trips (2.2 GB/block at
  stage2 batch 32) disappear, and (b) no internal boundaries — which is
  what the chain form here does.
- Stage4/5's REAL shapes (W = 84 / 42, not sublane-aligned) measured ~2x
  SLOWER fused (relayout per tile) — supports_block gates them out.

Formulation (pixel-major NHWC; grid (B, H/tm)):
- a depth-D chain consumes input rows [r0-D, r0+tm+D) (D halo rows per
  side, delivered by 2D extra one-row BlockSpecs on the same array with
  clamped index maps) and produces output rows [r0, r0+tm).
- per block d (rows shrink by 2 per block): conv1 as ONE matmul over all
  window rows; SAME-pad semantics applied to t1 (zero rows that fall
  outside the image — NOT to x: a zero x row gives t1 = relu(off1) != 0
  through BN); conv2 as ONE dense matmul against the im2col of the nine
  (dy, dx)-shifted views (K = 9M dense-packs the MXU vs the emitter's
  25-50% utilization at M=64); conv3 + BN + residual + ReLU fused.
- frozen-BN folded to per-channel (inv, off) by the caller
  (models/resnet.py _BNFolded; keras-resnet freeze_bn parity).

Used by models/resnet.py when RetinaNet(block_kernel=True): each stage's
identity run (blocks 1..n-1) becomes one chain call; projection/strided
blocks stay on XLA. Inference-only (no VJP). Equivalence:
tests/ops/test_pallas_block.py. Reference analog: keras-resnet's
bottleneck_2d stacks inside keras_retinanet/models/resnet.py (SURVEY.md
§2.2 "ResNet backbone").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU compiler knobs (absent on CPU-only wheels)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["fused_bottleneck", "fused_bottleneck_chain", "supports_block"]


def supports_block(x_shape, cmid: int) -> bool:
    """(B, H, W, C) with W a sublane-friendly multiple of 8 and the
    channel dims MXU-tileable. H can be anything >= 4 (row offsets live on
    outer dims — any divisor tiles; _resolve_tm picks one). At the product
    800x1344 bucket this admits stage2 (200x336) and stage3 (100x168);
    stage4/5 (50x84, 25x42) fail w % 8 — measured ~2x SLOWER fused there
    (per-tile relayouts), so the gate is a perf decision, not a guess."""
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    return (
        h >= 4 and w >= 16 and w % 8 == 0
        and c % 64 == 0 and cmid % 8 == 0
    )


def _resolve_tm(h: int, tm: int) -> int:
    """Largest divisor of H at most the requested tm.

    Row offsets here live on OUTER array dims (H of an NHWC block — the
    tiled dims are (W, C)), so unlike the stem kernel no 8-sublane
    alignment constraint applies; any divisor compiles. (The round-5 first
    cut required tm % 8 == 0 and silently fell back to tm == H when the
    requested tm wasn't — a whole-image 34 MB VMEM window that took the
    Mosaic compiler down with an opaque tunnel HTTP 500.)"""
    for cand in range(min(tm, h), 0, -1):
        if h % cand == 0:
            return cand
    return h


def _make_chain_kernel(tm: int, h: int, w: int, cin: int, cmid: int,
                      depth: int, compute_dtype):
    def kernel(*refs):
        # refs: D top-halo rows (outermost first), mid block, D bottom-halo
        # rows, then w1s/w2s/w3s, bn1i/bn1o/bn2i/bn2o/bn3i/bn3o, out
        tops = refs[:depth]
        xm_ref = refs[depth]
        bots = refs[depth + 1:2 * depth + 1]
        (w1_ref, w2_ref, w3_ref, b1i_ref, b1o_ref, b2i_ref, b2o_ref,
         b3i_ref, b3o_ref) = refs[2 * depth + 1:2 * depth + 10]
        o_ref = refs[-1]

        i = pl.program_id(1)
        r0 = i * tm

        # window rows [r0-D, r0+tm+D): halo refs are CLAMPED in-bounds
        # duplicates beyond the image — harmless, the t1 rows computed
        # from them are zero-masked below (SAME padding applies to t1)
        y = jnp.concatenate(
            [t[0, 0][None] for t in tops]
            + [xm_ref[0]]
            + [b[0, 0][None] for b in bots], axis=0,
        )  # (tm + 2D, W, Cin)

        for d in range(depth):
            rows_d = tm + 2 * (depth - d)
            a1 = y.reshape(rows_d * w, cin)
            t1 = jax.lax.dot_general(
                a1, w1_ref[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t1 = jnp.maximum(t1 * b1i_ref[d] + b1o_ref[d], 0.0)
            t1 = t1.astype(compute_dtype).reshape(rows_d, w, cmid)
            # conv2's SAME row padding: zero t1 rows outside the image
            row_img = (r0 - (depth - d)) + jax.lax.broadcasted_iota(
                jnp.int32, (rows_d, 1, 1), 0)
            t1 = jnp.where((row_img >= 0) & (row_img < h), t1,
                           jnp.zeros((), t1.dtype))
            # conv2 (3x3 SAME in W via a zero-padded copy) as ONE matmul
            t1p = jnp.pad(t1, ((0, 0), (1, 1), (0, 0)))
            rows_o = rows_d - 2
            a2 = jnp.concatenate(
                [t1p[dy:dy + rows_o, dx:dx + w, :].reshape(rows_o * w, cmid)
                 for dy in range(3) for dx in range(3)], axis=1,
            )  # (rows_o*W, 9M)
            t2 = jax.lax.dot_general(
                a2, w2_ref[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t2 = jnp.maximum(t2 * b2i_ref[d] + b2o_ref[d], 0.0)
            t2 = t2.astype(compute_dtype)
            # conv3 + BN + residual + ReLU; residual = y's central rows
            t3 = jax.lax.dot_general(
                t2, w3_ref[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            res = y[1:rows_d - 1].reshape(rows_o * w, cin).astype(jnp.float32)
            yn = jnp.maximum(t3 * b3i_ref[d] + b3o_ref[d] + res, 0.0)
            y = yn.astype(compute_dtype).reshape(rows_o, w, cin)

        o_ref[0] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tm", "interpret", "out_dtype"),
)
def fused_bottleneck_chain(
    x: jnp.ndarray,
    w1s: jnp.ndarray,
    w2s: jnp.ndarray,
    w3s: jnp.ndarray,
    bn1_inv: jnp.ndarray, bn1_off: jnp.ndarray,
    bn2_inv: jnp.ndarray, bn2_off: jnp.ndarray,
    bn3_inv: jnp.ndarray, bn3_off: jnp.ndarray,
    tm: int = 8,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """A run of D consecutive identity bottleneck blocks, fused.

    x: (B, H, W, C); w1s: (D, C, M); w2s: (D, 3, 3, M, M); w3s: (D, M, C);
    bn1/2_*: (D, M); bn3_*: (D, C) — folded frozen-BN scale/offset pairs.
    Returns the run's output, bit-comparable to the XLA lowering at the
    same compute dtype (f32-accumulated matmuls, intermediates rounded
    through x.dtype exactly like the XLA conv sequence's tensors).
    """
    b, h, w, cin = x.shape
    depth, _, cmid = w1s.shape
    if (w1s.shape != (depth, cin, cmid)
            or w2s.shape != (depth, 3, 3, cmid, cmid)
            or w3s.shape != (depth, cmid, cin)):
        raise ValueError(
            f"bad weight shapes {w1s.shape}/{w2s.shape}/{w3s.shape} for "
            f"x {x.shape}")
    if not supports_block(x.shape, cmid):
        raise ValueError(f"unsupported block shape {x.shape} cmid={cmid}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if out_dtype is None:
        out_dtype = x.dtype
    compute_dtype = x.dtype

    tm = _resolve_tm(h, tm)
    n_rows = h // tm

    w2c = w2s.reshape(depth, 9 * cmid, cmid).astype(compute_dtype)
    w1c = w1s.astype(compute_dtype)
    w3c = w3s.astype(compute_dtype)

    def per_ch(v):  # (D, C) -> (D, 1, C): broadcast over (rows, C) per d
        return v.astype(jnp.float32).reshape(depth, 1, -1)

    cbytes = jnp.dtype(compute_dtype).itemsize
    rows0 = tm + 2 * depth
    work_bytes = (
        rows0 * w * cin * cbytes * 3
        + rows0 * w * cmid * (4 + cbytes)
        + rows0 * (w + 2) * cmid * cbytes
        + (rows0 - 2) * w * 9 * cmid * cbytes
        + (rows0 - 2) * w * cmid * (4 + cbytes)
        + (rows0 - 2) * w * cin * (4 + 4 + cbytes)
        + depth * (cin * cmid * 2 + 9 * cmid * cmid) * cbytes
    )
    io_bytes = 2 * (rows0 * w * cin + tm * w * cin) * cbytes
    vmem_limit = min(110 * 1024 * 1024, int(1.5 * work_bytes) + io_bytes
                     + (6 << 20))
    params = {}
    if pltpu is not None and not interpret:
        cp = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
        params["compiler_params"] = cp(
            vmem_limit_bytes=int(vmem_limit),
            dimension_semantics=("parallel", "parallel"),
        )
        params["cost_estimate"] = pl.CostEstimate(
            flops=2 * b * h * w * depth * (cin * cmid * 2 + 9 * cmid * cmid),
            bytes_accessed=2 * b * h * w * cin * cbytes,
            transcendentals=0,
        )

    # halo row specs: top row j covers image row r0 - D + j (j = 0..D-1,
    # outermost first), bottom row j covers r0 + tm + j; both clamped
    # in-bounds (the kernel zero-masks t1 where the image ends)
    def top_map(j):
        return lambda bi, mi: (bi, jnp.maximum(mi * tm - depth + j, 0), 0, 0)

    def bot_map(j):
        return lambda bi, mi: (bi, jnp.minimum(mi * tm + tm + j, h - 1), 0, 0)

    row_spec = lambda m: pl.BlockSpec((1, 1, w, cin), m)
    in_specs = (
        [row_spec(top_map(j)) for j in range(depth)]
        + [pl.BlockSpec((1, tm, w, cin), lambda bi, mi: (bi, mi, 0, 0))]
        + [row_spec(bot_map(j)) for j in range(depth)]
        + [
            pl.BlockSpec((depth, cin, cmid), lambda bi, mi: (0, 0, 0)),
            pl.BlockSpec((depth, 9 * cmid, cmid), lambda bi, mi: (0, 0, 0)),
            pl.BlockSpec((depth, cmid, cin), lambda bi, mi: (0, 0, 0)),
            pl.BlockSpec((depth, 1, cmid), lambda bi, mi: (0, 0, 0)),
            pl.BlockSpec((depth, 1, cmid), lambda bi, mi: (0, 0, 0)),
            pl.BlockSpec((depth, 1, cmid), lambda bi, mi: (0, 0, 0)),
            pl.BlockSpec((depth, 1, cmid), lambda bi, mi: (0, 0, 0)),
            pl.BlockSpec((depth, 1, cin), lambda bi, mi: (0, 0, 0)),
            pl.BlockSpec((depth, 1, cin), lambda bi, mi: (0, 0, 0)),
        ]
    )

    out = pl.pallas_call(
        _make_chain_kernel(tm, h, w, cin, cmid, depth, compute_dtype),
        grid=(b, n_rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tm, w, cin), lambda bi, mi: (bi, mi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cin), out_dtype),
        interpret=interpret,
        **params,
    )(
        *([x] * depth), x, *([x] * depth),
        w1c, w2c, w3c,
        per_ch(bn1_inv), per_ch(bn1_off), per_ch(bn2_inv), per_ch(bn2_off),
        per_ch(bn3_inv), per_ch(bn3_off),
    )
    return out


def fused_bottleneck(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    w3: jnp.ndarray,
    bn1_inv: jnp.ndarray, bn1_off: jnp.ndarray,
    bn2_inv: jnp.ndarray, bn2_off: jnp.ndarray,
    bn3_inv: jnp.ndarray, bn3_off: jnp.ndarray,
    tm: int = 8,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """One identity bottleneck block, fused — the depth-1 chain.

    x: (B, H, W, C); w1: (C, M); w2: (3, 3, M, M); w3: (M, C);
    bn*_inv/off: per-channel folded frozen-BN scale/offset (f32)."""
    cin = x.shape[-1] if x.ndim == 4 else -1
    cmid = w1.shape[-1]
    if (w1.shape != (cin, cmid) or w2.shape != (3, 3, cmid, cmid)
            or w3.shape != (cmid, cin)):
        raise ValueError(
            f"bad weight shapes {w1.shape}/{w2.shape}/{w3.shape} for "
            f"x {x.shape}")
    return fused_bottleneck_chain(
        x, w1[None], w2[None], w3[None],
        bn1_inv[None], bn1_off[None], bn2_inv[None], bn2_off[None],
        bn3_inv[None], bn3_off[None],
        tm=tm, interpret=interpret, out_dtype=out_dtype,
    )
