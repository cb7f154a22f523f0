"""Training-path fused ingest+stem: Pallas forward, custom-VJP backward.

Inference already runs the fused ingest+stem Pallas kernel
(ops/pallas_stem.py): raw uint8 rows stream through VMEM and only the
pooled (B, H/4, W/4, 64) stem activations reach HBM. This module extends
the same kernel to TRAINING via `jax.custom_vjp`:

- forward: `fused_stem_packed` (one kernel: normalize + 7x7/2 conv +
  frozen-BN + ReLU + 3x3/2 SAME maxpool), uint8 in — the (B, H, W, 3)
  float canvas and the (B, H/2, W/2, 64) conv output never touch HBM on
  the forward path;
- backward, two modes (fused_stem_train(backward=...)):
  "remat" — rematerialized XLA reference. The packed bytes are
  re-normalized (Pallas rows kernel, ~2 ms — XLA's own uint8 lowering is
  the measured catastrophe, see ops/pallas_ingest.py) and the stem's
  gradient is the `jax.vjp` of the exact op sequence the non-fused train
  path runs (StemConv -> FrozenBatchNorm -> relu -> max_pool;
  models/resnet.py:184-192). Gradient ROUTING (e.g. maxpool argmax ties)
  is therefore bit-identical to NON-FUSED training; the forward VALUES
  differ from the Pallas forward by float tolerance (MXU contraction
  order), so in bf16 its routing can differ from the Pallas forward's
  where the two roundings disagree.
  "kernel" — the all-Pallas backward (ops/pallas_stem.
  fused_stem_bwd_packed), the product default (train/step.py; measured
  fastest): recomputes the banded conv in VMEM and routes the pool
  gradient on the SAME bf16-rounded values the Pallas forward pooled —
  faithful to the forward actually being trained.

Memory/traffic trade (why remat): the non-fused path must keep the conv
output alive from forward to backward for the relu/pool routing —
(B, H/2, W/2, 64) is 1.1 GB in bf16 at batch 32, ~9 ms of HBM write+read
at the measured ~250 GB/s. Rematerializing replaces that traffic with one
extra conv forward in the backward pass. The conv input has no gradient
(it is the image), so XLA's backward emits only the filter gradient.

The image is a uint8 leaf: its cotangent is `float0` (integer primals are
non-differentiable), so gradients flow only to the stem conv kernel and —
when BN is not frozen — the folded BN multiplier/offset.

Reference: the upstream stem is keras-resnet's trained conv1/bn1
(SURVEY.md §2.2 backbone row); this module changes how its gradient is
computed, not what it is.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdnet.ops.pallas_ingest import normalize_uint8_rows
from tdnet.ops.pallas_stem import fused_stem_packed, supports_shape

__all__ = ["fused_stem_train", "stem_reference_packed"]


def stem_reference_packed(packed, kernel7, inv, off, normalize, out_dtype):
    """The XLA op sequence the fused kernel replaces, from packed uint8 rows:
    normalize -> pad-3 7x7/2 valid conv -> y*inv+off -> relu -> 3x3/2 SAME
    maxpool. Mirrors the non-fused train path's ops (and therefore its
    gradient routing): conv and pool run in the model compute dtype with
    f32 params cast in, like StemConv/FrozenBatchNorm (models/resnet.py,
    models/layers.py)."""
    b, h, w3 = packed.shape
    w = w3 // 3
    compute = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    x = normalize_uint8_rows(
        packed.reshape(b * h, w3), mode=normalize, out_dtype=compute
    ).reshape(b, h, w, 3)
    z = jax.lax.conv_general_dilated(
        x,
        kernel7.astype(compute),
        window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    a = nn.relu(z * inv.astype(compute) + off.astype(compute))
    return nn.max_pool(a, (3, 3), strides=(2, 2), padding="SAME").astype(
        out_dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _stem_train(normalize, out_dtype, backward, packed, kernel7, inv, off):
    return fused_stem_packed(
        packed, kernel7, inv, off, normalize=normalize, out_dtype=out_dtype
    )


def _stem_train_fwd(normalize, out_dtype, backward, packed, kernel7, inv, off):
    y = fused_stem_packed(
        packed, kernel7, inv, off, normalize=normalize, out_dtype=out_dtype
    )
    return y, (packed, kernel7, inv, off)


def _param_grads(backward, normalize, out_dtype, packed, kernel7, inv, off,
                 dy):
    """(dkernel7, dinv, doff) in the params' dtypes — the single backward
    dispatch shared by the plain and the shard_map-per-shard paths."""
    if backward == "kernel":
        # all-Pallas backward: recompute + route + accumulate dG in one
        # kernel (ops/pallas_stem._make_bwd_kernel) — no XLA C=3 conv
        from tdnet.ops.pallas_stem import fused_stem_bwd_packed

        dk, dinv, doff = fused_stem_bwd_packed(
            packed, kernel7, inv, off, dy, normalize=normalize,
            out_dtype=out_dtype,
        )
    else:
        _, vjp = jax.vjp(
            lambda k, i, o: stem_reference_packed(
                packed, k, i, o, normalize, out_dtype
            ),
            kernel7,
            inv,
            off,
        )
        dk, dinv, doff = vjp(dy)
    return (dk.astype(kernel7.dtype), dinv.astype(inv.dtype),
            doff.astype(off.dtype))


def _stem_train_bwd(normalize, out_dtype, backward, residuals, dy):
    packed, kernel7, inv, off = residuals
    dk, dinv, doff = _param_grads(
        backward, normalize, out_dtype, packed, kernel7, inv, off, dy)
    # uint8 image leaf: integer primals take a float0 cotangent
    dpacked = np.zeros(packed.shape, dtype=jax.dtypes.float0)
    return dpacked, dk, dinv, doff


_stem_train.defvjp(_stem_train_fwd, _stem_train_bwd)


# ---- mesh-sharded form ----------------------------------------------------
#
# pallas_call is an opaque custom call to the GSPMD partitioner, so the plain
# op above cannot appear in an auto-partitioned multi-device graph (it would
# force a gather of the batch-sharded array). shard_map makes the kernel
# SPMD-explicit instead: each device runs the forward kernel on its local
# batch shard; the backward runs per shard and psums the parameter gradients
# over the data axis — exactly the collective XLA would have inserted for a
# partitioned conv's filter gradient. check_rep=False because Mosaic custom
# calls are opaque to shard_map's replication checker too.

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _stem_train_sharded(normalize, out_dtype, backward, mesh, axis,
                        packed, kernel7, inv, off):
    return _sharded_fwd(normalize, out_dtype, mesh, axis,
                        packed, kernel7, inv, off)


def _sharded_fwd(normalize, out_dtype, mesh, axis, packed, kernel7, inv, off):
    from jax.sharding import PartitionSpec as P

    def body(p, k, i, o):
        return fused_stem_packed(
            p, k, i, o, normalize=normalize, out_dtype=out_dtype)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(), P(), P()),
        out_specs=P(axis), check_vma=False,
    )(packed, kernel7, inv, off)


def _stem_train_sharded_fwd(normalize, out_dtype, backward, mesh, axis,
                            packed, kernel7, inv, off):
    y = _sharded_fwd(normalize, out_dtype, mesh, axis,
                     packed, kernel7, inv, off)
    return y, (packed, kernel7, inv, off)


def _stem_train_sharded_bwd(normalize, out_dtype, backward, mesh, axis,
                            residuals, dy):
    from jax.sharding import PartitionSpec as P

    packed, kernel7, inv, off = residuals

    def body(p, k, i, o, dy_local):
        dk, dinv, doff = _param_grads(
            backward, normalize, out_dtype, p, k, i, o, dy_local)
        # sum the per-shard parameter gradients over the data axis
        return (jax.lax.psum(dk, axis), jax.lax.psum(dinv, axis),
                jax.lax.psum(doff, axis))

    dk, dinv, doff = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(axis)),
        out_specs=(P(), P(), P()), check_vma=False,
    )(packed, kernel7, inv, off, dy)
    dpacked = np.zeros(packed.shape, dtype=jax.dtypes.float0)
    return dpacked, dk, dinv, doff


_stem_train_sharded.defvjp(_stem_train_sharded_fwd, _stem_train_sharded_bwd)


def fused_stem_train(packed, kernel7, inv, off, normalize="caffe",
                     out_dtype=jnp.bfloat16, backward="remat",
                     mesh=None, axis="data"):
    """Differentiable fused ingest+stem on packed (B, H, W*3) uint8 rows.

    Forward is the Pallas kernel (ops/pallas_stem.fused_stem_packed);
    `backward` picks the gradient path — "remat" rematerializes the XLA
    reference, "kernel" runs the all-Pallas backward kernel
    (ops/pallas_stem.fused_stem_bwd_packed). In f32 the two produce the
    same gradients incl. maxpool tie routing (tests/ops/
    test_pallas_stem_bwd.py). In bf16 they are NOT bit-identical: each
    routes the pool gradient on its own forward's bf16-rounded
    activations, and the two forwards differ by accumulation order
    (f32-accumulated banded matmul vs XLA's bf16 conv) — "kernel" routes
    on the exact values the Pallas forward pooled (faithful to the
    product forward), "remat" on the XLA reference's. Measured: matched
    tie sets on constant regions, small elementwise deltas on random
    input (tests/ops/test_stem_vjp.py bf16 test). `inv`/`off` are the
    folded frozen-BN multiplier/offset
    (models/resnet.py stem_params_from_variables); fold them from
    `stop_gradient`ed scale/bias to mirror FrozenBatchNorm's frozen=True
    semantics.

    `mesh` (a jax.sharding.Mesh with a batch axis named `axis`) runs the
    kernels under shard_map — one per-device invocation on the local batch
    shard, parameter gradients psum'd over the axis — making the op legal
    inside a GSPMD-partitioned multi-device graph. The batch size must
    divide evenly over the axis.
    """
    b, h, w3 = packed.shape
    if packed.dtype != jnp.uint8:
        raise TypeError(f"fused_stem_train expects uint8 rows, got {packed.dtype}")
    if w3 % 3 or not supports_shape((b, h, w3 // 3, 3)):
        raise ValueError(f"unsupported packed stem shape {packed.shape}")
    if backward not in ("remat", "kernel"):
        raise ValueError(f"unknown backward mode {backward!r}")
    if mesh is not None and mesh.size > 1:
        if b % mesh.size:
            raise ValueError(
                f"batch {b} does not divide over mesh axis {axis!r} "
                f"({mesh.size} devices)")
        return _stem_train_sharded(normalize, jnp.dtype(out_dtype), backward,
                                   mesh, axis, packed, kernel7, inv, off)
    return _stem_train(normalize, jnp.dtype(out_dtype), backward,
                       packed, kernel7, inv, off)
