"""Fused ingestion + ResNet stem Pallas kernel (the streaming stem).

Replaces the graph segment
    uint8 canvas -> normalize -> pad3 -> conv 7x7/2 (C=3 -> 64) -> frozen BN
    -> ReLU -> maxpool 3x3/2 (SAME)
with ONE kernel: uint8 (or prenormalized float) rows stream through VMEM and
only the pooled (B, H/4, W/4, 64) activations ever reach HBM.

Why (PERF.md round-2 stem study + round-3 layout findings):
- XLA's C=3 conv emitter floors at ~16.5 ms f32 / ~23 ms bf16 (batch 32,
  800x1344) vs a ~8 ms roofline; every in-graph reformulation (s2d,
  im2col+dot, channel pad) measured WORSE (models/resnet.py StemConv).
- Materializing any (B, H, W, 3) tensor on TPU gets layout T(8,128) with C
  padded 3 -> 128: a 42x physical blowup (17.6 GB at batch 64 — OOM), which
  is what sank the round-2 fused-uint8 ingestion path. Fusing ingestion
  INTO the stem means the tiny-C tensor never exists on device; the
  kernel's input is a byte-plane view and its output has C=64.

Formulation — banded matmul over shifted byte planes (all 2D vector ops;
Mosaic cannot lower the naive im2col's 1D->2D reshapes):
- XLA prep: the (B, H, W, 3) canvas viewed as (B, H, W*3) bytes, row-padded
  3 above / 5 below, then split into SIX interleaved byte planes
  xv[r, b, h, j] = x[b, h, 6j + r] (one strided transpose at bandwidth;
  plane r holds channel r%3 of every even (r<3) / odd (r>=3) pixel);
- in-kernel, per grid step (= TM pooled rows of one image): normalize the
  window's six (rows_in, W/2) planes (u8 -> i32 -> f32, subtract the
  per-plane scalar mean), zero the pad rows, and lane-shift each plane by
  d in {-2,-1,0,1}, zero-filling (= the conv's column padding). Stacking
  the 24 shifted planes gives S (_NP*rows_in, W/2) with
  S[(d,r,row), j] = x_norm[row, 6(j+d) + r].
- EVERY tap of EVERY conv row in the block is now a row of S: conv output
  (ci)[j, f] = sum_t W147[t, f] * S[s(ci, t), j], so the whole block's conv
  is ONE dense matmul OutT = G @ S with G ((2*TM+1)*64, _NP*rows_in) a
  banded constant built from the 7x7x3 weights (G block ci = block 0
  rolled 2*ci columns — taps advance 2 padded rows per conv row). K is
  ~85-91% dense-packed for the MXU vs XLA's tiny-K conv emitter.
- frozen BN + ReLU fold per 64-row channel block; 3x3/2 SAME maxpool =
  lane-shift maxes + row-block maxes + a 0/1 selection matmul (stride-2
  lane downsampling is not a supported Mosaic slice; a (W/2, W/4)
  selection matrix does it on the MXU for ~15% extra FLOPs).
- output is written channel-major (B, (H/4)*64, W/4) and untangled by one
  XLA transpose (bandwidth, ~2 ms at batch 32).

Weights enter as the raw (7,7,3,F) kernel; G is assembled from them in XLA
per call (a constant 0/1 selection matmul + rolls), so the op stays a pure
function of the parameters. Training uses this kernel too: ops/stem_vjp.py
wraps it in a jax.custom_vjp whose backward is either a rematerialized XLA
op sequence or the all-Pallas `fused_stem_bwd_packed` below (the product
default — see train/step.py).

Validated against the XLA stem in tests/ops/test_pallas_stem.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU compiler knobs (absent on CPU-only wheels)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from tdnet.data.image import CAFFE_MEAN_BGR

__all__ = ["fused_stem", "fused_stem_packed", "fused_stem_bwd_packed",
           "supports_shape"]

_SHIFTS = (-2, -1, 0, 1)
# (lane shift d, interleave plane r) pieces actually read by some tap:
# tap (kc, c) lives at lane offset 3*kc + c - 9 in {-9..11} = piece
# (d, r) with d, r = divmod(offset, 6). The d=-2 pieces with r < 3 cover
# offsets -12..-10 — no tap maps there, their G columns are all zero, so
# they are dropped (21 pieces, not 24: -12.5% matmul K and 3 fewer VPU
# shift-copies per grid step, bit-exactly).
_PIECES = tuple(
    (d, r) for d in _SHIFTS for r in range(6) if not (d == -2 and r < 3)
)
_NP = len(_PIECES)  # 21
_PIECE_IDX = {p: i for i, p in enumerate(_PIECES)}
# _window_s_matrix builds S as d-grouped stacked-plane shifts; that
# construction and _sel_matrix must agree on this exact order
assert _PIECES == (
    tuple((-2, r) for r in (3, 4, 5))
    + tuple((d, r) for d in (-1, 0, 1) for r in range(6))
)


def out_dtype_itemsize(dt) -> int:
    return jnp.dtype(dt).itemsize


def supports_shape(shape) -> bool:
    """(B, H, W, 3) with H a multiple of 8 and W a multiple of 4 (every
    bucket qualifies: dims are multiples of 32 — data/generator.py
    default_buckets). H % 8 guarantees H/4 is even, so _resolve_tm can
    always pick an even row-block size — Mosaic requires the window row
    offset 4*tm*mi to be 8-sublane-aligned, which an odd tm with more
    than one grid step violates (hard compile error on TPU)."""
    return (
        len(shape) == 4
        and shape[-1] == 3
        and shape[1] % 8 == 0
        and shape[2] % 4 == 0
        and shape[1] >= 8
        and shape[2] >= 8
    )


def _sel_matrix(rows_in: int) -> np.ndarray:
    """(147, _NP*rows_in) 0/1 matrix: tap t = kr*21 + kc*3 + c of conv row 0
    reads S row _PIECE_IDX[(d, r)]*rows_in + kr, where
    (d, r) = divmod(3*kc+c-9, 6)."""
    k = _NP * rows_in
    sel = np.zeros((147, k), np.float32)
    for kr in range(7):
        for kc in range(7):
            for c in range(3):
                t = kr * 21 + kc * 3 + c
                d, r = divmod(3 * kc + c - 9, 6)
                sel[t, _PIECE_IDX[(d, r)] * rows_in + kr] = 1.0
    return sel


def _down_matrix(w2: int) -> np.ndarray:
    """(w2, w2//2) 0/1 matrix selecting every even lane (stride-2
    downsample as a matmul)."""
    d = np.zeros((w2, w2 // 2), np.float32)
    d[np.arange(0, w2, 2), np.arange(w2 // 2)] = 1.0
    return d


def _plane_means(normalize):
    if normalize == "caffe":
        # plane r holds channel r % 3 (BGR)
        return [float(CAFFE_MEAN_BGR[r % 3]) for r in range(6)], 1.0
    if normalize == "tf":
        return [127.5] * 6, 1.0 / 127.5
    return [0.0] * 6, 1.0


def _window_s_matrix(x_ref, m0, h, rows_in, normalize, compute_dtype):
    """The block's S matrix (_NP*rows_in, w2): normalized, pad-masked window
    planes, lane-shifted by d in _SHIFTS (see module docstring). Shared by
    the forward and backward kernels — both need the identical S."""
    plane_mean, scale = _plane_means(normalize)
    planes = []
    for r in range(6):
        p = x_ref[r, 0, pl.ds(4 * m0, rows_in), :]  # (rows_in, w2)
        if normalize is not None:
            pf = (p.astype(jnp.int32).astype(jnp.float32)
                  - plane_mean[r]) * scale
            orig = 4 * m0 - 3 + jax.lax.broadcasted_iota(
                jnp.int32, (rows_in, 1), 0
            )
            pf = jnp.where((orig >= 0) & (orig < h), pf, 0.0)
        else:
            pf = p.astype(jnp.float32)  # float path: pads already zero
        planes.append(pf.astype(compute_dtype))

    # _PIECES is d-major with r ascending (d=-2 keeps only r>=3), so S is
    # four d-groups of stacked planes: shifting each STACK once replaces 21
    # per-piece shift+concat ops with 3 big shifts + 2 concats (identical S)
    p_all = jnp.concatenate(planes, axis=0)      # (6*rows_in, w2)
    p_odd = jnp.concatenate(planes[3:], axis=0)  # (3*rows_in, w2), d=-2 set

    def sh(v, d):
        n = v.shape[0]
        if d > 0:
            return jnp.concatenate(
                [v[:, d:], jnp.zeros((n, d), v.dtype)], axis=1)
        return jnp.concatenate(
            [jnp.zeros((n, -d), v.dtype), v[:, :d]], axis=1)

    return jnp.concatenate(
        [sh(p_odd, -2), sh(p_all, -1), p_all, sh(p_all, 1)], axis=0)


def _resolve_tm(h: int, tm: int) -> int:
    """Largest usable divisor of H/4 at most the requested tm.

    Usable = even, or equal to H/4 (single row-block): the kernels read the
    input window at row offset 4*tm*mi, and Mosaic requires that offset to
    be statically 8-sublane-aligned — an odd tm with more than one grid
    step fails to compile on TPU (verified: h=24 resolves 4 -> 3 under the
    naive rule and aborts with "cannot statically prove that index ... is
    a multiple of 8")."""
    hp4 = h // 4
    for cand in range(min(tm, hp4), 0, -1):
        if hp4 % cand == 0 and (cand % 2 == 0 or cand == hp4):
            return cand
    raise ValueError(
        f"no usable row-block size for H={h} (H/4={hp4} odd); "
        "supports_shape() gates this out"
    )


def _prep_operands(packed, kernel7, tm, compute_dtype):
    """XLA prep shared by the forward and backward kernels: the six
    interleaved byte planes xv (6, B, H+8, w2), the banded conv-as-matmul
    weight G (n_conv*f, _NP*rows_in), and the stride-2 lane-downsample
    selection matrix dmat (w2, w2//2)."""
    b, h, w3 = packed.shape
    w = w3 // 3
    w2 = w // 2
    rows_in = 4 * tm + 7
    n_conv = 2 * tm + 1
    f = kernel7.shape[-1]

    # row-pad, split into six interleaved byte planes
    xp = jnp.pad(packed, ((0, 0), (3, 5), (0, 0)))
    xv = xp.reshape(b, h + 8, w2, 6).transpose(3, 0, 1, 2)  # (6, B, H+8, w2)

    # G: conv row 0's band, rolled 2 columns per subsequent conv row
    w147 = kernel7.astype(jnp.float32).reshape(147, f)
    sel = jnp.asarray(_sel_matrix(rows_in))  # (147, _NP*rows_in)
    g0 = jax.lax.dot_general(  # (f, _NP*rows_in)
        w147, sel, (((0,), (0,)), ((), ())))
    g = jnp.concatenate(
        [jnp.roll(g0, 2 * ci, axis=1) for ci in range(n_conv)], axis=0
    ).astype(compute_dtype)  # (n_conv*f, _NP*rows_in)

    dmat = jnp.asarray(_down_matrix(w2), compute_dtype)  # (w2, w4)
    return xv, g, dmat


def _make_kernel(h, w, tm, normalize, compute_dtype, f, direct=False):
    w2 = w // 2
    w4 = w // 4
    rows_in = 4 * tm + 7
    n_conv = 2 * tm + 1

    def kernel(x_ref, g_ref, inv_ref, off_ref, d_ref, o_ref):
        m0 = pl.program_id(1) * tm
        neg = jnp.float32(-3.4e38)

        s_mat = _window_s_matrix(x_ref, m0, h, rows_in, normalize,
                                 compute_dtype)

        # ---- the whole block's conv as ONE banded matmul ------------------
        out_t = jax.lax.dot_general(
            g_ref[...], s_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_conv * f, w2) f32

        inv = inv_ref[...]  # (f, 1)
        off = off_ref[...]  # (f, 1)
        dmat = d_ref[...]   # (w2, w4)

        # ---- BN + ReLU over the whole block, then cast to compute dtype.
        # Casting BEFORE the max chain is bit-exact (rounding is monotone:
        # round(max(a,b)) == max(round(a), round(b)); ReLU likewise), and
        # halves the VPU traffic of every shift/max below when bf16.
        inv_t = jnp.concatenate([inv] * n_conv, axis=0)  # (n_conv*f, 1)
        off_t = jnp.concatenate([off] * n_conv, axis=0)
        y_all = jnp.maximum(out_t * inv_t + off_t, 0.0).astype(compute_dtype)
        neg = jnp.asarray(neg, compute_dtype)

        # ---- column max3 per conv-row block -------------------------------
        yc = []
        for ci in range(n_conv):
            y = y_all[ci * f:(ci + 1) * f]  # (f, w2)
            y1 = jnp.concatenate(
                [y[:, 1:], jnp.full((f, 1), neg, y.dtype)], axis=1)
            y2 = jnp.concatenate(
                [y[:, 2:], jnp.full((f, 2), neg, y.dtype)], axis=1)
            yc.append(jnp.maximum(jnp.maximum(y, y1), y2))

        # final conv row (global 2*m0 + 2*tm) does not exist in the image's
        # last block (conv rows end at h/2 - 1) — mask it there
        last_ok = (2 * m0 + 2 * tm) < (h // 2)
        yc[n_conv - 1] = jnp.where(
            last_ok, yc[n_conv - 1], jnp.full_like(yc[n_conv - 1], neg))

        # ---- row max3 + stride-2 lane downsample (selection matmul) -------
        for m in range(tm):
            pm = jnp.maximum(
                jnp.maximum(yc[2 * m], yc[2 * m + 1]), yc[2 * m + 2])
            pooled = jax.lax.dot_general(
                pm.astype(compute_dtype), dmat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (f, w4)
            if direct:
                # transpose (f, w4) -> (w4, f) on the MXU (identity matmul,
                # exact: each output is one input value summed in f32) and
                # write NHWC directly — no XLA untangle pass after the call
                eye = (
                    jax.lax.broadcasted_iota(jnp.int32, (f, f), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
                ).astype(compute_dtype)
                pt = jax.lax.dot_general(
                    pooled.astype(compute_dtype), eye,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (w4, f)
                o_ref[0, m, :, :] = pt.astype(o_ref.dtype)
            else:
                o_ref[0, m * f:(m + 1) * f, :] = pooled.astype(o_ref.dtype)

    return kernel


def _make_bwd_kernel(h, w, tm, normalize, compute_dtype, f):
    """Backward of the fused stem in ONE kernel per block: recompute S and
    the banded conv, route the pooled gradient back through maxpool (XLA
    select-and-scatter semantics: FIRST max in row-major window order) and
    ReLU/BN, and accumulate dG = dZ @ S^T plus the BN reductions across all
    grid steps. The filter gradient never goes through XLA's C=3
    conv-backprop emitter (the same small-C lowering the forward kernel
    exists to avoid), and the (B, H/2, W/2, 64) conv output is never
    stored — it is rematerialized in VMEM."""
    w2 = w // 2
    rows_in = 4 * tm + 7
    n_conv = 2 * tm + 1

    def kernel(x_ref, g_ref, inv_ref, off_ref, d_ref, dy_ref,
               dg_ref, dinv_ref, doff_ref):
        bi = pl.program_id(0)
        mi = pl.program_id(1)
        m0 = mi * tm
        neg = jnp.float32(-3.4e38)

        s_mat = _window_s_matrix(x_ref, m0, h, rows_in, normalize,
                                 compute_dtype)
        out_t = jax.lax.dot_general(
            g_ref[...], s_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_conv*f, w2) f32 — the rematerialized conv rows

        inv = inv_ref[...]  # (f, 1)
        off = off_ref[...]
        dmat = d_ref[...]   # (w2, w4)

        # per conv row: pre-activation (f32, for the ReLU mask and the BN
        # gradients) and the relu output ROUNDED THROUGH compute_dtype —
        # the pool routing below must compare the exact values the forward
        # pooled (the forward casts BN+ReLU output to compute_dtype before
        # its max chain); routing on the unrounded f32 values misroutes
        # wherever two window entries are distinct in f32 but tie on the
        # bf16 grid (common in constant-color page regions). The round-trip
        # cast back to f32 is exact (bf16 ⊂ f32) and keeps the comparisons
        # in f32 — Mosaic does not lower bf16 `==` on this target. The
        # out-of-image last row (global 2*m0 + 2*tm == h/2 in the last
        # block) is neg so it can never win a pool window (a >= 0 > neg).
        w_pre, a_rows = [], []
        for ci in range(n_conv):
            wp = out_t[ci * f:(ci + 1) * f] * inv + off
            a = (jnp.maximum(wp, 0.0).astype(compute_dtype)
                 .astype(jnp.float32))
            if ci == n_conv - 1:
                last_ok = (2 * m0 + 2 * tm) < (h // 2)
                a = jnp.where(last_ok, a, jnp.full_like(a, neg))
            w_pre.append(wp)
            a_rows.append(a)

        def shift_l(v, s, fill):
            if s == 0:
                return v
            return jnp.concatenate(
                [v[:, s:], jnp.full((f, s), fill, v.dtype)], axis=1)

        def shift_r(v, s):
            if s == 0:
                return v
            return jnp.concatenate(
                [jnp.zeros((f, s), v.dtype), v[:, :-s]], axis=1)

        da = [jnp.zeros((f, w2), jnp.float32) for _ in range(n_conv)]
        for m in range(tm):
            dym = dy_ref[0, m * f:(m + 1) * f, :].astype(jnp.float32)
            # undo the stride-2 lane downsample: dy at even lanes, 0 at odd
            dpre = jax.lax.dot_general(
                dym, dmat.astype(jnp.float32), (((1,), (1,)), ((), ())),
            )  # (f, w2)
            rows = (2 * m, 2 * m + 1, 2 * m + 2)
            # window values a[r, j+s] at lane j; SAME pool pads with -inf,
            # so right-edge shifts fill neg (0.0 would falsely tie pool==0)
            shifted = {
                (r, s): shift_l(a_rows[r], s, neg)
                for r in rows for s in (0, 1, 2)
            }
            pool = functools.reduce(jnp.maximum, shifted.values())
            taken = jnp.zeros((f, w2), jnp.bool_)
            for r in rows:          # row-major = XLA select_and_scatter order
                for s in (0, 1, 2):
                    eq = shifted[(r, s)] == pool
                    route = jnp.where(eq & ~taken, dpre, 0.0)
                    taken = taken | eq
                    da[r] = da[r] + shift_r(route, s)

        dz = []
        dinv_p = jnp.zeros((f, 1), jnp.float32)
        doff_p = jnp.zeros((f, 1), jnp.float32)
        for ci in range(n_conv):
            dwp = jnp.where(w_pre[ci] > 0, da[ci], 0.0)
            doff_p += jnp.sum(dwp, axis=1, keepdims=True)
            dinv_p += jnp.sum(dwp * out_t[ci * f:(ci + 1) * f], axis=1,
                              keepdims=True)
            dz.append((dwp * inv).astype(compute_dtype))
        dz_mat = jnp.concatenate(dz, axis=0)  # (n_conv*f, w2)
        dg_p = jax.lax.dot_general(
            dz_mat, s_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_conv*f, _NP*rows_in)

        @pl.when((bi == 0) & (mi == 0))
        def _():
            dg_ref[...] = jnp.zeros_like(dg_ref)
            dinv_ref[...] = jnp.zeros_like(dinv_ref)
            doff_ref[...] = jnp.zeros_like(doff_ref)

        dg_ref[...] += dg_p
        dinv_ref[...] += dinv_p
        doff_ref[...] += doff_p

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("normalize", "out_dtype", "interpret", "tm"),
)
def fused_stem_bwd_packed(
    packed: jnp.ndarray,
    kernel7: jnp.ndarray,
    bn_inv: jnp.ndarray,
    bn_off: jnp.ndarray,
    dy: jnp.ndarray,
    normalize: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    tm: int = 2,
) -> tuple:
    """Gradients (dkernel7 f32, dbn_inv f32, dbn_off f32) of the fused stem
    w.r.t. its parameters, given the pooled-output cotangent `dy`
    (B, H/4, W/4, F) — the all-Pallas alternative to the rematerialized
    XLA backward in ops/stem_vjp.py (see _make_bwd_kernel). `out_dtype`
    selects the compute dtype exactly like the forward (bf16 -> bf16
    matmuls with f32 accumulation)."""
    b, h, w3 = packed.shape
    w = w3 // 3
    if not supports_shape((b, h, w, 3)) or w * 3 != w3:
        raise ValueError(f"unsupported packed stem shape {packed.shape}")
    if normalize is not None and packed.dtype != jnp.uint8:
        raise TypeError("normalize requires uint8 input")
    if normalize is None and packed.dtype == jnp.uint8:
        # mirror the forward's guard: without it the float path would run
        # astype on raw bytes and return finite but WRONG gradients
        raise TypeError("uint8 input requires a normalize mode")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    hp4 = h // 4
    tm = _resolve_tm(h, tm)
    rows_in = 4 * tm + 7
    n_conv = 2 * tm + 1
    w2, w4 = w // 2, w // 4
    f = kernel7.shape[-1]
    compute_dtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32

    xv, g, dmat = _prep_operands(packed, kernel7, tm, compute_dtype)
    inv = bn_inv.astype(jnp.float32)[:, None]
    off = bn_off.astype(jnp.float32)[:, None]
    # channel-major cotangent rows, the layout the forward kernel wrote
    dy_cm = dy.transpose(0, 1, 3, 2).reshape(b, hp4 * f, w4)

    cbytes = 2 if compute_dtype == jnp.bfloat16 else 4
    in_bytes = 6 * (h + 8) * w2 * packed.dtype.itemsize
    work_bytes = (
        2 * (n_conv * f) * (_NP * rows_in) * cbytes          # G (+ copy)
        + 3 * (_NP * rows_in) * w2 * cbytes                  # planes/pieces/S
        + (n_conv * f) * w2 * (3 * 4 + cbytes)              # out_t/da/dz f32
        + 12 * f * w2 * 4                                   # window shifts
        + (n_conv * f) * (_NP * rows_in) * 4 * 2             # dG acc + part
        + w2 * w4 * cbytes
        + tm * f * w4 * out_dtype_itemsize(dy.dtype)
    )
    vmem_limit = min(
        100 * 1024 * 1024, 2 * in_bytes + 2 * work_bytes + (8 << 20)
    )
    params = {}
    if pltpu is not None and not interpret:
        cp = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
        params["compiler_params"] = cp(vmem_limit_bytes=int(vmem_limit))

    dg, dinv, doff = pl.pallas_call(
        _make_bwd_kernel(h, w, tm, normalize, compute_dtype, f),
        grid=(b, hp4 // tm),
        in_specs=[
            pl.BlockSpec((6, 1, h + 8, w2), lambda bi, mi: (0, bi, 0, 0)),
            pl.BlockSpec((n_conv * f, _NP * rows_in), lambda bi, mi: (0, 0)),
            pl.BlockSpec((f, 1), lambda bi, mi: (0, 0)),
            pl.BlockSpec((f, 1), lambda bi, mi: (0, 0)),
            pl.BlockSpec((w2, w4), lambda bi, mi: (0, 0)),
            pl.BlockSpec((1, tm * f, w4), lambda bi, mi: (bi, mi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n_conv * f, _NP * rows_in), lambda bi, mi: (0, 0)),
            pl.BlockSpec((f, 1), lambda bi, mi: (0, 0)),
            pl.BlockSpec((f, 1), lambda bi, mi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_conv * f, _NP * rows_in), jnp.float32),
            jax.ShapeDtypeStruct((f, 1), jnp.float32),
            jax.ShapeDtypeStruct((f, 1), jnp.float32),
        ],
        interpret=interpret,
        **params,
    )(xv, g, inv, off, dmat, dy_cm)

    # un-band: dG rows for conv row ci are the row-0 band rolled 2*ci
    # columns, so dg0 = sum_ci roll^{-1}(dG_ci); then dW147[t, f'] =
    # sum_k sel[t, k] * dg0[f', k] (the transpose of the G assembly)
    dg0 = sum(
        jnp.roll(dg[ci * f:(ci + 1) * f], -2 * ci, axis=1)
        for ci in range(n_conv)
    )  # (f, _NP*rows_in)
    sel = jnp.asarray(_sel_matrix(rows_in))  # (147, _NP*rows_in)
    dw147 = jax.lax.dot_general(
        sel, dg0, (((1,), (1,)), ((), ())))  # (147, f)
    return dw147.reshape(7, 7, 3, f), dinv[:, 0], doff[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("normalize", "out_dtype", "interpret", "tm"),
)
def fused_stem(
    images: jnp.ndarray,
    kernel7: jnp.ndarray,
    bn_inv: jnp.ndarray,
    bn_off: jnp.ndarray,
    normalize: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    tm: int = 4,  # measured best in-pipeline (273.1 vs 270.0 img/s @tm=2)
) -> jnp.ndarray:
    """images (B,H,W,3) [uint8 when `normalize`, else float already
    normalized] -> pooled stem activations (B, H/4, W/4, F).

    kernel7: (7,7,3,F) stem weights; bn_inv/bn_off (F,): folded frozen-BN
    multiplier/offset (inv = scale/rsqrt, off = bias - mean*inv). Matches
    StemConv + FrozenBatchNorm + ReLU + SAME 3x3/2 maxpool
    (models/resnet.py:84-127,170-173) to float tolerance (MXU contraction
    order differs from XLA's conv emitter). Differentiable via
    ops/stem_vjp.fused_stem_train (custom VJP; see module docstring).

    LAYOUT TRAP: only call this form on INTERMEDIATES inside a larger jit.
    A (B, H, W, 3) jit ARGUMENT gets the padded T(8,128) layout (C: 3->128,
    42x blowup); jit-boundary callers must host-view the batch to
    (B, H, W*3) and call fused_stem_packed (tiles cleanly: W*3 pads to the
    next 128 multiple, <2% overhead at the product buckets)."""
    b, h, w, c = images.shape
    if not supports_shape(images.shape):
        raise ValueError(f"unsupported stem shape {images.shape}")
    return fused_stem_packed(
        images.reshape(b, h, w * 3), kernel7, bn_inv, bn_off,
        normalize=normalize, out_dtype=out_dtype, interpret=interpret, tm=tm,
    )


def fused_stem_packed(
    packed: jnp.ndarray,
    kernel7: jnp.ndarray,
    bn_inv: jnp.ndarray,
    bn_off: jnp.ndarray,
    normalize: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    tm: int = 4,  # measured best in-pipeline (273.1 vs 270.0 img/s @tm=2)
    direct: Optional[bool] = None,
) -> jnp.ndarray:
    """fused_stem on the packed (B, H, W*3) byte-row view (the jit-boundary
    form — a free numpy view of the contiguous NHWC host batch).

    direct: write NHWC from the kernel (in-kernel MXU transpose) instead of
    channel-major rows + an XLA untangle transpose. Bit-identical output;
    perf A/B only (measured +2.6 ms at batch 32 — a negative, default off).
    None -> env TDNET_STEM_DIRECT, resolved HERE (outside the jit cache) so
    flipping the env between calls is honored rather than silently hitting
    the first call's cached trace."""
    import os as _os

    if direct is None:
        direct = _os.environ.get("TDNET_STEM_DIRECT", "0") == "1"
    return _fused_stem_packed(
        packed, kernel7, bn_inv, bn_off, normalize=normalize,
        out_dtype=out_dtype, interpret=interpret, tm=tm, direct=bool(direct),
    )


@functools.partial(
    jax.jit,
    static_argnames=("normalize", "out_dtype", "interpret", "tm", "direct"),
)
def _fused_stem_packed(
    packed: jnp.ndarray,
    kernel7: jnp.ndarray,
    bn_inv: jnp.ndarray,
    bn_off: jnp.ndarray,
    normalize: Optional[str],
    out_dtype,
    interpret: Optional[bool],
    tm: int,
    direct: bool,
) -> jnp.ndarray:
    b, h, w3 = packed.shape
    w = w3 // 3
    if not supports_shape((b, h, w, 3)) or w * 3 != w3:
        raise ValueError(f"unsupported packed stem shape {packed.shape}")
    if normalize is not None and packed.dtype != jnp.uint8:
        raise TypeError("normalize requires uint8 input")
    if normalize is None and packed.dtype == jnp.uint8:
        raise TypeError("uint8 input requires a normalize mode")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    images = packed  # naming below: dtype checks only

    hp4 = h // 4
    tm = _resolve_tm(h, tm)
    rows_in = 4 * tm + 7
    n_conv = 2 * tm + 1
    w2, w4 = w // 2, w // 4
    f = kernel7.shape[-1]
    compute_dtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32

    xv, g, dmat = _prep_operands(packed, kernel7, tm, compute_dtype)
    inv = bn_inv.astype(jnp.float32)[:, None]  # (f, 1)
    off = bn_off.astype(jnp.float32)[:, None]

    # The default 16 MB scoped-VMEM budget is too small for the large-tm
    # variants (whole-image input block + S + G + f32 accumulator); v5e has
    # 128 MB of physical VMEM, so raise the cap to what the buffers need.
    cbytes = 2 if compute_dtype == jnp.bfloat16 else 4
    in_bytes = 6 * (h + 8) * w2 * images.dtype.itemsize
    work_bytes = (
        2 * (n_conv * f) * (_NP * rows_in) * cbytes      # G (+ copy)
        + 3 * (_NP * rows_in) * w2 * cbytes              # planes/pieces/S
        + (n_conv * f) * w2 * (4 + 2 * cbytes)          # out_t f32 + yc
        + w2 * w4 * cbytes                              # dmat
        + 4 * tm * f * w4 * out_dtype_itemsize(out_dtype)
    )
    # generous: Mosaic's stack accounting runs ~1.5x the hand count (the
    # measured OOM asked 23.66M where the count said ~16M); v5e has 128 MB
    # physical VMEM so over-asking only trims double-buffer headroom
    vmem_limit = min(
        100 * 1024 * 1024, 2 * in_bytes + 2 * work_bytes + (8 << 20)
    )
    params = {}
    if pltpu is not None and not interpret:
        cp = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
        # forward grid steps are independent (disjoint output blocks):
        # declaring them parallel lets Mosaic overlap DMA across steps.
        # (The backward kernel accumulates into shared refs — stays
        # sequential ("arbitrary").)
        params["compiler_params"] = cp(
            vmem_limit_bytes=int(vmem_limit),
            dimension_semantics=("parallel", "parallel"),
        )

    if direct:
        out_specs = pl.BlockSpec(
            (1, tm, w4, f), lambda bi, mi: (bi, mi, 0, 0))
        out_shape = jax.ShapeDtypeStruct((b, hp4, w4, f), out_dtype)
    else:
        out_specs = pl.BlockSpec(
            (1, tm * f, w4), lambda bi, mi: (bi, mi, 0))
        out_shape = jax.ShapeDtypeStruct((b, hp4 * f, w4), out_dtype)

    out = pl.pallas_call(
        _make_kernel(h, w, tm, normalize, compute_dtype, f, direct=direct),
        grid=(b, hp4 // tm),
        in_specs=[
            pl.BlockSpec((6, 1, h + 8, w2), lambda bi, mi: (0, bi, 0, 0)),
            pl.BlockSpec((n_conv * f, _NP * rows_in), lambda bi, mi: (0, 0)),
            pl.BlockSpec((f, 1), lambda bi, mi: (0, 0)),
            pl.BlockSpec((f, 1), lambda bi, mi: (0, 0)),
            pl.BlockSpec((w2, w4), lambda bi, mi: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(xv, g, inv, off, dmat)

    if direct:
        return out  # already (B, hp4, w4, F)

    # untangle the channel-major rows: (B, hp4*F, w4) -> (B, hp4, w4, F)
    return out.reshape(b, hp4, f, w4).transpose(0, 1, 3, 2)
