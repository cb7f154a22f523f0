"""On-device anchor target assignment (pure jnp, vmappable).

Behavioral contract (SURVEY.md §3 "Target assignment"; reference:
keras_retinanet/utils/anchors.py anchor_targets_bbox + compute_gt_annotations):

- IoU(anchor, best GT) >= 0.5 -> positive; < 0.4 -> negative; else ignore
  (state -1). No per-GT best-anchor forcing.
- IoU uses the legacy "+1" convention (the reference computes it with the
  Cython compute_overlap.pyx).
- Anchors whose CENTER falls outside the (unpadded) image -> ignore.
- labels: (N, K+1) one-hot over K classes + trailing anchor-state column.
- regression: (N, 4+1) corner-parameterized normalized targets + state.

The reference runs this per-sample on the host (Cython IoU, the training
hot loop — SURVEY.md §4.1). Here it is a vectorized O(N*M) XLA computation
executed on-device inside the jitted train step; ground truth is passed as
fixed-size padded arrays with a validity mask.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tdnet.ops.boxes import DEFAULT_MEAN, DEFAULT_STD, bbox_transform, box_iou

__all__ = ["anchor_targets", "batched_anchor_targets"]


def anchor_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    image_hw: jnp.ndarray,
    num_classes: int,
    negative_overlap: float = 0.4,
    positive_overlap: float = 0.5,
    mean: Sequence[float] = DEFAULT_MEAN,
    std: Sequence[float] = DEFAULT_STD,
):
    """Assign targets for one image.

    Args:
      anchors: (N, 4) anchors for the padded canvas.
      gt_boxes: (M, 4) padded ground-truth boxes (x1, y1, x2, y2).
      gt_labels: (M,) int class ids.
      gt_mask: (M,) bool/int validity of each GT slot.
      image_hw: (2,) actual (pre-padding) image height/width — anchors whose
        center falls outside it are ignored.
      num_classes: K.

    Returns:
      labels: (N, K+1) float32 — one-hot + anchor state column.
      regression: (N, 5) float32 — normalized targets + anchor state column.
    """
    anchors = jnp.asarray(anchors, dtype=jnp.float32)
    gt_boxes = jnp.asarray(gt_boxes, dtype=jnp.float32)
    gt_mask = jnp.asarray(gt_mask, dtype=bool)

    n = anchors.shape[0]
    has_gt = jnp.any(gt_mask)

    overlaps = box_iou(anchors, gt_boxes, mode="legacy")  # (N, M)
    # invalid GT slots can never be matched
    overlaps = jnp.where(gt_mask[None, :], overlaps, -1.0)

    # Per-anchor best GT WITHOUT argmax/gather: TPU gathers over N=200k+
    # indices dominate the train step (measured 54 ms of a 156 ms batch-8
    # step). Instead: a max reduction + a first-occurrence one-hot (argmax
    # tie order == lowest index, via a lower-triangular cumsum MATMUL), and
    # matched label/box via one-hot dot products — all MXU/VPU work.
    m = gt_boxes.shape[0]
    max_overlaps = jnp.max(overlaps, axis=1)  # (N,)
    eq = (overlaps == max_overlaps[:, None]) & gt_mask[None, :]
    eqf = eq.astype(jnp.float32)
    inclusive_tril = jnp.tril(jnp.ones((m, m), jnp.float32))  # (M, M)
    csum = eqf @ inclusive_tril.T  # inclusive cumsum along M
    first_hot = jnp.where(eq & (csum == 1.0), 1.0, 0.0)  # (N, M) one-hot

    positive = (max_overlaps >= positive_overlap) & has_gt
    ignore = (max_overlaps > negative_overlap) & ~positive & has_gt

    # anchor-state column: 1 positive / -1 ignore / 0 negative
    state = jnp.where(positive, 1.0, jnp.where(ignore, -1.0, 0.0))

    # centers outside the actual image -> ignore (reference: anchor_targets_bbox
    # tail; only the >= width/height side is tested, matching upstream).
    cx = (anchors[:, 0] + anchors[:, 2]) / 2.0
    cy = (anchors[:, 1] + anchors[:, 3]) / 2.0
    h = jnp.asarray(image_hw[0], dtype=jnp.float32)
    w = jnp.asarray(image_hw[1], dtype=jnp.float32)
    outside = (cx >= w) | (cy >= h)
    state = jnp.where(outside, -1.0, state)

    # classification targets: one-hot at the matched GT for positives
    # (first_hot @ class-one-hot == one_hot(gt_labels[argmax]) exactly:
    # a one-hot row selects a single 0/1 row, no float error)
    gt_label_hot = jax.nn.one_hot(gt_labels, num_classes, dtype=jnp.float32)
    one_hot = first_hot @ gt_label_hot  # (N, K)
    one_hot = jnp.where((state == 1.0)[:, None], one_hot, 0.0)
    labels = jnp.concatenate([one_hot, state[:, None]], axis=1)

    # regression targets for the matched GT (meaningful only where positive).
    # Row selection via broadcast multiply+sum, NOT a dot: TPU f32 matmuls
    # may lower to split-bf16 passes, while 1.0*b + 0.0*b' + ... is exact
    # IEEE f32 on the VPU — bit-identical to a gather. (The 0/1-valued
    # label/cumsum matmuls above are integer-exact in any precision.)
    matched_box = jnp.sum(
        first_hot[:, :, None] * gt_boxes[None, :, :], axis=1
    )  # (N, 4)
    reg = bbox_transform(anchors, matched_box, mean=mean, std=std)
    reg = jnp.where((state == 1.0)[:, None], reg, 0.0)
    regression = jnp.concatenate([reg, state[:, None]], axis=1)

    return labels, regression


def batched_anchor_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    image_hw: jnp.ndarray,
    num_classes: int,
    **kwargs,
):
    """vmap of :func:`anchor_targets` over a leading batch dimension.

    gt_boxes: (B, M, 4); gt_labels/gt_mask: (B, M); image_hw: (B, 2).
    Returns labels (B, N, K+1) and regression (B, N, 5).
    """
    fn = lambda b, l, m, hw: anchor_targets(
        anchors, b, l, m, hw, num_classes, **kwargs
    )
    return jax.vmap(fn)(gt_boxes, gt_labels, gt_mask, image_hw)
