"""Box transforms, clipping, and pairwise IoU (pure jnp).

Behavioral contract (SURVEY.md §3):

- Regression targets are CORNER-parameterized (not the paper's center/size
  form):  t = ((gt_x1-a_x1)/a_w, (gt_y1-a_y1)/a_h, (gt_x2-a_x2)/a_w,
  (gt_y2-a_y2)/a_h), normalized (t - mean)/std with mean=0, std=0.2
  (reference: utils/anchors.py bbox_transform).
- Decode is the exact inverse: pred_x1 = a_x1 + (d0*std0 + mean0)*a_w, etc.
  (reference: backend/common.py bbox_transform_inv), then clip to the image
  (reference: layers/_misc.py ClipBoxes).
- Pairwise IoU has TWO conventions in the reference:
  * compute_overlap.pyx uses the legacy Fast-R-CNN "+1" pixel convention
    (areas and intersections measured with +1) — used by anchor target
    assignment and mAP evaluation.
  * tf.image.non_max_suppression uses exact continuous IoU — used by NMS.
  `box_iou(mode=...)` exposes both; callers pick the one their reference
  counterpart used.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = ["bbox_transform", "bbox_transform_inv", "clip_boxes", "box_iou"]

DEFAULT_MEAN = (0.0, 0.0, 0.0, 0.0)
DEFAULT_STD = (0.2, 0.2, 0.2, 0.2)


def bbox_transform(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    mean: Sequence[float] = DEFAULT_MEAN,
    std: Sequence[float] = DEFAULT_STD,
) -> jnp.ndarray:
    """Corner-parameterized regression targets, normalized by (mean, std).

    anchors, gt_boxes: (..., 4) as (x1, y1, x2, y2). Returns (..., 4).
    Reference: utils/anchors.py bbox_transform.
    """
    mean = jnp.asarray(mean, dtype=anchors.dtype)
    std = jnp.asarray(std, dtype=anchors.dtype)

    anchor_widths = anchors[..., 2] - anchors[..., 0]
    anchor_heights = anchors[..., 3] - anchors[..., 1]

    targets = jnp.stack(
        [
            (gt_boxes[..., 0] - anchors[..., 0]) / anchor_widths,
            (gt_boxes[..., 1] - anchors[..., 1]) / anchor_heights,
            (gt_boxes[..., 2] - anchors[..., 2]) / anchor_widths,
            (gt_boxes[..., 3] - anchors[..., 3]) / anchor_heights,
        ],
        axis=-1,
    )
    return (targets - mean) / std


def bbox_transform_inv(
    boxes: jnp.ndarray,
    deltas: jnp.ndarray,
    mean: Sequence[float] = DEFAULT_MEAN,
    std: Sequence[float] = DEFAULT_STD,
) -> jnp.ndarray:
    """Decode regression deltas against anchor boxes (exact inverse of
    :func:`bbox_transform`). boxes/deltas: (..., 4).

    Reference: backend/common.py bbox_transform_inv, layers/_misc.py
    RegressBoxes(mean=0, std=0.2).
    """
    mean = jnp.asarray(mean, dtype=deltas.dtype)
    std = jnp.asarray(std, dtype=deltas.dtype)

    width = boxes[..., 2] - boxes[..., 0]
    height = boxes[..., 3] - boxes[..., 1]

    d = deltas * std + mean
    x1 = boxes[..., 0] + d[..., 0] * width
    y1 = boxes[..., 1] + d[..., 1] * height
    x2 = boxes[..., 2] + d[..., 2] * width
    y2 = boxes[..., 3] + d[..., 3] * height
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def clip_boxes(boxes: jnp.ndarray, image_shape_hw) -> jnp.ndarray:
    """Clamp (..., 4) boxes to [0, W] x [0, H].

    `image_shape_hw` is (height, width) — static ints or a traced array.
    Reference: layers/_misc.py ClipBoxes / backend clip_by_value.
    """
    h = jnp.asarray(image_shape_hw[0], dtype=boxes.dtype)
    w = jnp.asarray(image_shape_hw[1], dtype=boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_iou(boxes: jnp.ndarray, query_boxes: jnp.ndarray, mode: str = "exact") -> jnp.ndarray:
    """Pairwise IoU between (N, 4) and (K, 4) boxes -> (N, K).

    mode="legacy"  reproduces the reference's Cython compute_overlap.pyx
    (Fast-R-CNN +1 pixel convention; used for anchor targets and mAP eval).
    mode="exact"   continuous IoU (what tf.image.non_max_suppression uses;
    used for NMS).

    Vectorized O(N*K) broadcast — this replaces the reference's host-side
    Cython hot loop with on-device XLA (SURVEY.md §2.3).
    """
    if mode == "legacy":
        off = jnp.asarray(1.0, dtype=boxes.dtype)
    elif mode == "exact":
        off = jnp.asarray(0.0, dtype=boxes.dtype)
    else:
        raise ValueError(f"unknown IoU mode: {mode!r}")

    area_q = (query_boxes[:, 2] - query_boxes[:, 0] + off) * (
        query_boxes[:, 3] - query_boxes[:, 1] + off
    )  # (K,)
    area_b = (boxes[:, 2] - boxes[:, 0] + off) * (boxes[:, 3] - boxes[:, 1] + off)  # (N,)

    iw = (
        jnp.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
        - jnp.maximum(boxes[:, None, 0], query_boxes[None, :, 0])
        + off
    )
    ih = (
        jnp.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
        - jnp.maximum(boxes[:, None, 1], query_boxes[None, :, 1])
        + off
    )
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)

    intersection = iw * ih
    union = area_b[:, None] + area_q[None, :] - intersection
    return jnp.where(union > 0, intersection / union, 0.0)
