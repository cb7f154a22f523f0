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

__all__ = ["soft_nms_rescore"]


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
