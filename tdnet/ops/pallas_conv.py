"""Pallas TPU kernel: fused 1x1 conv (+folded BN affine) (+residual) (+ReLU).

Why this exists (measured, PERF.md "Committed profiler trace"): XLA:TPU does
NOT fuse the bottleneck residual-add + ReLU into the producing convolution —
the `add_maximum_fusion` passes cost ~28 ms of a 131 ms batch-32 inference
step, pure HBM round-trips of stage2/3/4 activation tensors. A 1x1 conv is
a plain matmul, so the whole tail of a bottleneck block

    y = relu(bn3(conv3(h)) + shortcut)

is one Pallas kernel here: an MXU matmul over (M=B*H*W, K) x (K, N) with the
BN fold, residual add, and ReLU applied in VMEM before the single bf16
write-back. Numerics intentionally mirror the unfused path (models/
layers.py FrozenBatchNorm applied to a bf16 conv output): the f32 MXU
accumulator is cast to the compute dtype BEFORE the affine/add, so fused
and unfused results agree to bf16 rounding.

MEASURED STATUS (v5e, tools/perf_fused_conv.py + perf_fused_sweep.py,
batch 32): roughly break-even with XLA's unfused conv + add_maximum pass —
stage2 (K=64) 14.3 ms fused vs 10.9 ms XLA, stage4 1.05x faster, stage5
~even; the tile sweep plateaus at ~14.4 ms on stage2 (vs a ~3 ms traffic
roofline), i.e. this kernel's matmul is currently slower than XLA's conv
emitter by about the same margin as the epilogue it saves. NOT wired into
the model; kept as tested, correct infrastructure for a future Mosaic
iteration (the 28 ms/step opportunity stands — PERF.md).

Forward-only; falls back to interpret mode off-TPU so CPU tests exercise
the same code path.

Reference parity note: the reference has no analog (Keras/TF1 fuses
nothing); this is a pure TPU-performance reformulation with identical math.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv1x1"]


def _kernel_res(x_ref, w_ref, s_ref, o_ref, r_ref, out_ref, *, relu):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = acc.astype(out_ref.dtype)  # match unfused: conv emits compute dtype
    y = y * s_ref[:].astype(out_ref.dtype) + o_ref[:].astype(out_ref.dtype)
    y = y + r_ref[:]
    if relu:
        y = jnp.maximum(y, 0)
    out_ref[:] = y


def _kernel_nores(x_ref, w_ref, s_ref, o_ref, out_ref, *, relu):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = acc.astype(out_ref.dtype)
    y = y * s_ref[:].astype(out_ref.dtype) + o_ref[:].astype(out_ref.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    out_ref[:] = y


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("relu", "interpret", "tile_m", "tile_n"),
)
def _fused_matmul(x2, w, inv, off, res2, relu, interpret, tile_m, tile_n):
    m, k = x2.shape
    n = w.shape[1]
    mp, np_ = _round_up(m, tile_m), _round_up(n, tile_n)

    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
        if res2 is not None:
            res2 = jnp.pad(res2, ((0, mp - m), (0, 0)))
    if np_ != n:
        w = jnp.pad(w, ((0, 0), (0, np_ - n)))
        inv = jnp.pad(inv, ((0, np_ - n),))
        off = jnp.pad(off, ((0, np_ - n),))
        if res2 is not None:
            res2 = jnp.pad(res2, ((0, 0), (0, np_ - n)))

    grid = (mp // tile_m, np_ // tile_n)
    x_spec = pl.BlockSpec((tile_m, k), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k, tile_n), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    mn_spec = pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)

    cost = pl.CostEstimate(
        flops=2 * mp * k * np_,
        bytes_accessed=(mp * k + k * np_ + mp * np_ * (2 if res2 is not None else 1))
        * x2.dtype.itemsize,
        transcendentals=0,
    )

    if res2 is not None:
        out = pl.pallas_call(
            functools.partial(_kernel_res, relu=relu),
            grid=grid,
            in_specs=[x_spec, w_spec, v_spec, v_spec, mn_spec],
            out_specs=mn_spec,
            out_shape=jax.ShapeDtypeStruct((mp, np_), x2.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, w, inv[None, :], off[None, :], res2)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_nores, relu=relu),
            grid=grid,
            in_specs=[x_spec, w_spec, v_spec, v_spec],
            out_specs=mn_spec,
            out_shape=jax.ShapeDtypeStruct((mp, np_), x2.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, w, inv[None, :], off[None, :])

    return out[:m, :n]


def fused_conv1x1(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    inv: jnp.ndarray,
    offset: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
    relu: bool = True,
    interpret: Optional[bool] = None,
    tile_m: int = 1024,
    tile_n: int = 256,
) -> jnp.ndarray:
    """out = [relu]( (x @ kernel) * inv + offset [+ residual] ).

    x: (..., K) activations (compute dtype, e.g. bf16).
    kernel: (1, 1, K, N) or (K, N) conv weight (f32 params fine; cast here).
    inv, offset: (N,) folded FrozenBatchNorm affine (f32).
    residual: optional (..., N) tensor added before the ReLU.
    """
    if kernel.ndim == 4:
        kernel = kernel.reshape(kernel.shape[2], kernel.shape[3])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    lead = x.shape[:-1]
    k = x.shape[-1]
    n = kernel.shape[1]
    m = 1
    for d in lead:
        m *= int(d)

    x2 = x.reshape(m, k)
    res2 = residual.reshape(m, n).astype(x.dtype) if residual is not None else None
    tile_n = min(tile_n, _round_up(n, 128))
    tile_m = min(tile_m, _round_up(m, 8))
    out = _fused_matmul(
        x2, kernel.astype(x.dtype), inv.astype(jnp.float32),
        offset.astype(jnp.float32), res2, relu, interpret, tile_m, tile_n,
    )
    return out.reshape(lead + (n,))
