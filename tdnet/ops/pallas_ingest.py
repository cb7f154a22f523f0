"""Pallas uint8 ingestion kernel: normalize raw pixel canvases at graph entry.

Motivation (BASELINE.md round-2 negative result): shipping uint8 canvases
saves 4x host->device transfer (the whole point of BASELINE config 2's
"ingestion fuses into XLA ops"), but XLA:TPU's uint8->f32 lowering is
catastrophic — the fused path cost ~150 ms/step at batch 32 (288 vs
249 ms/step at batch 64), erasing the transfer saving on-device. The op is
trivially bandwidth-bound: at batch 32 x 800x1344 it reads 103 MB (uint8)
and writes 413 MB (f32) — roughly 2 ms at the measured ~250-350 GB/s
device bandwidth (PERF.md), two orders of magnitude under XLA's lowering.

Formulation: the (B, H, W, 3) canvas is bit-identical to a (R, 3072) byte
matrix with 3072 = 1024 pixels x 3 channels. Every default bucket canvas
has H*W divisible by 1024 because both dims are multiples of 32
(data/generator.py default_buckets), so the reshape is exact; other shapes
fall back to the jnp path. The per-channel mean/scale pattern repeats every
3 lanes, so a trace-time (1, 3072) constant row turns the whole kernel into
one convert + broadcast multiply-add per tile:

    out[r, :] = (f32(in[r, :]) - mean_row) * scale        # caffe: scale=1
    tf mode:   (x - 127.5) / 127.5  ==  x/127.5 - 1  (exact in f32: x is an
               integer <= 255 and 127.5 is representable)

Reference behavior matched: keras_retinanet/utils/image.py preprocess_image
(mode='caffe' subtracts [103.939, 116.779, 123.68] BGR, no scaling;
mode='tf' maps to [-1, 1]).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tdnet.data.image import CAFFE_MEAN_BGR

__all__ = [
    "normalize_uint8",
    "normalize_uint8_flat",
    "normalize_uint8_rows",
    "normalize_uint8_packed_sharded",
    "supports_shape",
    "pack_uint8_host",
]

_ROW = 3072  # 1024 pixels x 3 channels; 24 lane-tiles of 128


def supports_shape(shape) -> bool:
    """True when (B, H, W, 3) flattens exactly into 3072-byte rows."""
    if len(shape) != 4 or shape[-1] != 3:
        return False
    total = int(np.prod(shape))
    return total % _ROW == 0 and total >= _ROW


def pack_uint8_host(images, flat: bool = False):
    """THE uint8 jit-boundary convention, in one place.

    A (B, H, W, 3) uint8 jit ARGUMENT gets the TPU's padded T(8,128)
    layout — C padded 3 -> 128 lanes, a 42x physical blowup (+86 ms/step
    measured at batch 32) — so every tdnet uint8 boundary ships a 2-D/3-D
    byte view instead (free host-side reshape):

    - flat=False: (B, H, W*3) packed rows — what normalize_uint8_rows and
      the fused ingest+stem kernel (ops/pallas_stem.py) consume;
    - flat=True: (R, 3072) flat rows — what normalize_uint8_flat consumes;
      requires the total size to divide 3072, else the input is returned
      UNCHANGED (4-D routing is shape-dispatched downstream — a silent
      repack would misroute it).

    Callers: data/prefetch.py (train batches), train/predictor.py, bench.py.
    Non-uint8 or non-NHWC input passes through unchanged.
    """
    if getattr(images, "dtype", None) != np.uint8 or images.ndim != 4 \
            or images.shape[-1] != 3:
        return images
    b, h, w, _ = images.shape
    if flat:
        if (b * h * w * 3) % _ROW == 0:
            return images.reshape(-1, _ROW)
        return images
    return images.reshape(b, h, w * 3)


def _kernel(x_ref, mean_ref, o_ref, *, scale: float):
    # Mosaic has no direct uint8->f32 cast; u8 -> i32 -> f32 lowers fine
    # and is exact (values 0..255)
    x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
    y = (x - mean_ref[...]) * scale
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "out_dtype", "interpret", "block_rows"),
)
def normalize_uint8_rows(
    mat: jnp.ndarray,
    mode: str = "caffe",
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    block_rows: int = 256,
) -> jnp.ndarray:
    """(R, W3) uint8 byte matrix (W3 % 3 == 0) -> normalized out_dtype.

    General-width form of :func:`normalize_uint8_flat` — e.g. the train
    step's packed (B, H, W*3) canvases viewed as (B*H, W*3) rows. The
    per-channel mean/scale pattern repeats every 3 lanes, so the mean row
    is a trace-time (1, W3) constant.
    """
    if mat.dtype != jnp.uint8:
        raise TypeError(f"normalize_uint8 expects uint8, got {mat.dtype}")
    if mat.ndim != 2 or mat.shape[-1] % 3 != 0:
        raise ValueError(f"expected (R, W3) with W3 %% 3 == 0, got {mat.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    w3 = mat.shape[-1]
    if mode == "caffe":
        mean = np.tile(np.asarray(CAFFE_MEAN_BGR, np.float32), w3 // 3)
        scale = 1.0
    elif mode == "tf":
        mean = np.full((w3,), 127.5, np.float32)
        scale = 1.0 / 127.5
    else:
        raise ValueError(f"unknown preprocessing mode {mode!r}")
    mean_row = jnp.asarray(mean)[None, :]  # (1, W3)

    rows = mat.shape[0]
    block_rows = min(block_rows, rows)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, w3), lambda i: (i, 0)),
            pl.BlockSpec((1, w3), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, w3), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, w3), out_dtype),
        interpret=interpret,
    )(mat, mean_row)


def normalize_uint8_packed_sharded(
    packed: jnp.ndarray,
    mode: str = "caffe",
    out_dtype=jnp.float32,
    mesh=None,
    axis: str = "data",
) -> jnp.ndarray:
    """Mesh-sharded form of the rows kernel for multi-device graphs:
    (B, H, W3) packed uint8 -> normalized (B, H, W3//3, 3).

    pallas_call is opaque to the GSPMD partitioner, so the plain kernel
    cannot appear in an auto-partitioned graph (it would gather the
    batch-sharded array). Under shard_map each device normalizes its local
    shard instead — the elementwise op needs no collective. Supported
    meshes: a 1-D ('data',) mesh (batch sharded) and the 2-D
    ('data', 'spatial') mesh of parallel/spatial.py (batch AND image-H
    sharded — normalization is per-pixel, and the channel mean pattern
    repeats within a ROW, so splitting H changes nothing). The sharded
    dims must divide evenly over their axes (shard_map is exact-division;
    callers fall back to the jnp normalize otherwise — train/step.py)."""
    from jax.sharding import PartitionSpec as P

    b, h, w3 = packed.shape
    if mesh is None or mesh.size <= 1:
        out = normalize_uint8_rows(
            packed.reshape(b * h, w3), mode=mode, out_dtype=out_dtype)
        return out.reshape(b, h, w3 // 3, 3)
    names = tuple(mesh.axis_names)
    if names == (axis,):
        if b % mesh.size:
            raise ValueError(
                f"batch {b} does not divide over mesh axis {axis!r} "
                f"({mesh.size} devices)")
        spec = P(axis)
    elif names == (axis, "spatial"):
        nd = int(mesh.shape[axis])
        ns = int(mesh.shape["spatial"])
        if b % nd or h % ns:
            raise ValueError(
                f"(batch {b}, H {h}) does not divide over the "
                f"({axis}={nd}, spatial={ns}) mesh")
        spec = P(axis, "spatial")
    else:
        raise ValueError(
            f"unsupported mesh axes {names} (expected ({axis!r},) or "
            f"({axis!r}, 'spatial'))")

    def body(p):
        lb, lh, _ = p.shape
        out = normalize_uint8_rows(
            p.reshape(lb * lh, w3), mode=mode, out_dtype=out_dtype)
        return out.reshape(lb, lh, w3 // 3, 3)

    return jax.shard_map(
        body, mesh=mesh, in_specs=spec, out_specs=spec,
        check_vma=False,
    )(packed)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "out_dtype", "interpret", "block_rows"),
)
def normalize_uint8_flat(
    flat: jnp.ndarray,
    mode: str = "caffe",
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    block_rows: int = 256,
) -> jnp.ndarray:
    """(R, 3072) uint8 byte matrix -> normalized out_dtype, same shape.

    THE jit-boundary form (round-3 measurement): a (B, H, W, 3) uint8 jit
    ARGUMENT whose first consumer is a reshape gets the padded T(8,128)
    layout (C: 3 -> 128 lanes, a 42x physical blowup) — end-to-end that
    cost +86 ms/step at batch 32. Callers must ship THIS flat view across
    the boundary (a free numpy view on the host: contiguous NHWC bytes)
    and reshape the normalized float output back to NHWC inside the jit.
    """
    if flat.ndim != 2 or flat.shape[-1] != _ROW:
        raise ValueError(f"expected (R, {_ROW}), got {flat.shape}")
    return normalize_uint8_rows(
        flat, mode=mode, out_dtype=out_dtype, interpret=interpret,
        block_rows=block_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mode", "out_dtype", "interpret", "block_rows"),
)
def normalize_uint8(
    images: jnp.ndarray,
    mode: str = "caffe",
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    block_rows: int = 256,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> normalized out_dtype, via a Pallas kernel.

    Exactly preprocess_image_device(images, mode).astype(out_dtype) for
    mode='caffe' (subtract is exact in f32); 'tf' matches to float rounding.
    Requires supports_shape(images.shape); callers dispatch (data/image.py).

    NOTE: only call this on uint8 INTERMEDIATES inside a larger jit. For a
    uint8 jit ARGUMENT, ship the flat (R, 3072) view across the boundary
    and call normalize_uint8_flat — see its docstring for the layout trap.
    """
    if images.dtype != jnp.uint8:
        raise TypeError(f"normalize_uint8 expects uint8, got {images.dtype}")
    if not supports_shape(images.shape):
        raise ValueError(
            f"shape {images.shape} does not flatten into {_ROW}-byte rows; "
            "use the jnp fallback (preprocess_image_device)"
        )
    shape = images.shape
    rows = int(np.prod(shape)) // _ROW
    out = normalize_uint8_flat(
        images.reshape(rows, _ROW), mode=mode, out_dtype=out_dtype,
        interpret=interpret, block_rows=block_rows,
    )
    return out.reshape(shape)
