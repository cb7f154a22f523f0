"""Soft-NMS (Bodla et al. 2017) — BASELINE.json config 5 ("multi-class
page-layout detection with class-aware decode + soft-NMS").

Instead of binary suppression, each selected box decays the scores of its
overlaps: gaussian s *= exp(-iou^2/sigma) or linear s *= (1-iou) for
iou > iou_threshold. Greedy selection is inherently sequential, so the
static-shape formulation runs `max_detections` fori_loop steps of K-wide
vector work — the candidate set is pre-trimmed (top-k) exactly like the hard
NMS path, keeping the loop short and VPU-friendly.

No reference analog (the reference ships hard NMS only); this extends the
FilterDetections surface for the page-layout config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tdnet.ops.boxes import box_iou

__all__ = ["soft_nms_rescore", "soft_nms_rescore_batched"]


@functools.partial(
    jax.jit, static_argnames=("method", "max_selections")
)
def soft_nms_rescore(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    method: str = "gaussian",
    sigma: float = 0.5,
    iou_threshold: float = 0.3,
    score_threshold: float = 0.001,
    max_selections: int = 300,
) -> jnp.ndarray:
    """Return soft-NMS-rescored scores for (K, 4)/(K,) candidates.

    Selected boxes keep their (decayed-at-selection-time) score; candidates
    never selected within max_selections, or decayed below score_threshold,
    get score 0. Downstream top-k ordering over the returned scores
    reproduces the greedy selection order.
    """
    k = boxes.shape[0]
    iou = box_iou(boxes, boxes, mode="exact")  # (K, K)

    if method == "gaussian":
        decay = jnp.exp(-(iou ** 2) / sigma)
    elif method == "linear":
        decay = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
    else:
        raise ValueError(f"unknown soft-NMS method {method!r}")

    def body(_, carry):
        remaining, out = carry
        idx = jnp.argmax(remaining)
        top = remaining[idx]
        selected = top > score_threshold
        # record the selected box's final score
        out = jnp.where(
            selected, out.at[idx].set(top), out
        )
        # decay everyone by the selected box's overlap row; remove selection.
        # -inf "removed" sentinels must stay -inf (linear decay can be
        # exactly 0 at IoU==1, and -inf * 0 = NaN poisons argmax)
        new_remaining = jnp.where(
            jnp.isfinite(remaining), remaining * decay[idx, :], remaining
        )
        new_remaining = new_remaining.at[idx].set(-jnp.inf)
        remaining = jnp.where(selected, new_remaining, remaining)
        return remaining, out

    init = (
        jnp.where(scores > score_threshold, scores, -jnp.inf),
        jnp.zeros((k,), scores.dtype),
    )
    _, out = jax.lax.fori_loop(0, min(max_selections, k), body, init)
    return out


# ---------------------------------------------------------------- Pallas ----


ROW_TILE = 8  # (batch*class) rows processed together per grid step


def _soft_nms_kernel(
    boxes_ref, scores_ref, out_ref, *,
    method, sigma, iou_threshold, score_threshold, iters,
):
    """ROW_TILE (batch*class) rows per grid step, vectorized on sublanes.
    Blocks: boxes (RT, 4, K) transposed so coordinates ride the lane axis;
    scores/out (RT, K).

    The greedy rescoring loop runs entirely in VMEM/registers — the XLA
    fori_loop formulation pays per-iteration op dispatch over HBM-resident
    (B*C, K) tensors (~210 ms of a 342 ms config-5 step, BASELINE.md).
    Here each iteration is a handful of (RT, K) VPU ops shared by RT
    independent rows, and the while_loop exits as soon as every row's best
    remaining score drops to the threshold (identical output — further
    iterations are no-ops)."""
    rt, k = scores_ref.shape
    boxes = boxes_ref[...]  # (RT, 4, K)
    scores = scores_ref[...]  # (RT, K)

    lane = jax.lax.broadcasted_iota(jnp.int32, (rt, k), 1)
    remaining0 = jnp.where(scores > score_threshold, scores,
                           -jnp.inf * jnp.ones_like(scores))
    out0 = jnp.zeros_like(scores)

    x1 = boxes[:, 0, :]  # (RT, K)
    y1 = boxes[:, 1, :]
    x2 = boxes[:, 2, :]
    y2 = boxes[:, 3, :]
    area = (x2 - x1) * (y2 - y1)

    def body(carry):
        t, remaining, out = carry
        top = jnp.max(remaining, axis=1, keepdims=True)  # (RT, 1)
        # per-row argmax via reductions only (Mosaic lowers reduce_min/max,
        # not argmax): lowest lane holding the max — jnp.argmax tie order
        idx = jnp.min(jnp.where(remaining == top, lane, k),
                      axis=1, keepdims=True)  # (RT, 1)
        selected = top > score_threshold  # (RT, 1)

        is_idx = lane == idx  # (RT, K)
        out = jnp.where(selected & is_idx, top, out)

        # IoU of each row's selected box against its candidates (exact mode,
        # identical op order to ops/boxes.box_iou). Mosaic has no
        # dynamic_slice on values, so coordinates are extracted with one-hot
        # masked row reductions (exactly one lane set per row).
        sel_mask = is_idx.astype(x1.dtype)
        bx1 = jnp.sum(x1 * sel_mask, axis=1, keepdims=True)  # (RT, 1)
        by1 = jnp.sum(y1 * sel_mask, axis=1, keepdims=True)
        bx2 = jnp.sum(x2 * sel_mask, axis=1, keepdims=True)
        by2 = jnp.sum(y2 * sel_mask, axis=1, keepdims=True)
        barea = jnp.sum(area * sel_mask, axis=1, keepdims=True)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)  # (RT, K)

        if method == "gaussian":
            decay = jnp.exp(-(iou ** 2) / sigma)
        else:
            decay = jnp.where(iou > iou_threshold, 1.0 - iou,
                              jnp.ones_like(iou))

        finite = remaining > -jnp.inf
        new_remaining = jnp.where(finite, remaining * decay, remaining)
        new_remaining = jnp.where(is_idx, -jnp.inf, new_remaining)
        remaining = jnp.where(selected, new_remaining, remaining)
        return t + 1, remaining, out

    def cond(carry):
        t, remaining, _ = carry
        return jnp.logical_and(
            t < iters, jnp.max(remaining) > score_threshold
        )

    _, _, out = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), remaining0, out0)
    )
    out_ref[...] = out


def soft_nms_rescore_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    method: str = "gaussian",
    sigma: float = 0.5,
    iou_threshold: float = 0.3,
    score_threshold: float = 0.001,
    max_selections: int = 300,
    interpret: bool = None,
) -> jnp.ndarray:
    """Pallas-batched soft-NMS: (R, K, 4) boxes / (R, K) scores -> (R, K)
    rescored, one grid row per (batch, class) pair. Same results as
    vmapped soft_nms_rescore (tested); K must be a multiple of 128."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r, k, _ = boxes.shape
    if k % 128 != 0 or r % ROW_TILE != 0:
        pad_k = (-k) % 128
        pad_r = (-r) % ROW_TILE
        boxes = jnp.pad(boxes, ((0, pad_r), (0, pad_k), (0, 0)))
        scores = jnp.pad(scores, ((0, pad_r), (0, pad_k)),
                         constant_values=-jnp.inf)
        out = soft_nms_rescore_batched(
            boxes, scores, method=method, sigma=sigma,
            iou_threshold=iou_threshold, score_threshold=score_threshold,
            max_selections=max_selections, interpret=interpret,
        )
        return out[:r, :k]

    kernel = functools.partial(
        _soft_nms_kernel, method=method, sigma=sigma,
        iou_threshold=iou_threshold, score_threshold=score_threshold,
        iters=min(max_selections, k),
    )
    boxes_t = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)  # (R,4,K)
    out = pl.pallas_call(
        kernel,
        grid=(r // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, k), jnp.float32),
        interpret=interpret,
    )(boxes_t, scores.astype(jnp.float32))
    return out
