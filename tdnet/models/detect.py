"""Inference path: model outputs -> final detections (reference:
models/retinanet.py retinanet_bbox()).

anchors -> RegressBoxes(mean=0, std=0.2) -> ClipBoxes -> sigmoid ->
FilterDetections, entirely on-device with static shapes. Anchors are
trace-time constants of the (bucketed) padded image shape, so the whole
pipeline jits once per bucket and the batch dimension vmaps.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tdnet.ops.anchors import AnchorParameters, anchors_for_shape
from tdnet.ops.boxes import bbox_transform_inv, clip_boxes
from tdnet.ops.nms import Detections, filter_detections

__all__ = ["detections_from_outputs", "decode_boxes"]


def decode_boxes(
    regression: jnp.ndarray,
    image_shape_hw,
    anchor_params: Optional[AnchorParameters] = None,
) -> jnp.ndarray:
    """Decode (B, N, 4) regression deltas into clipped (B, N, 4) boxes."""
    anchors = jnp.asarray(
        anchors_for_shape(image_shape_hw, anchor_params=anchor_params),
        dtype=regression.dtype,
    )
    boxes = bbox_transform_inv(anchors[None, :, :], regression)
    return clip_boxes(boxes, image_shape_hw)


def detections_from_outputs(
    outputs: dict,
    image_shape_hw,
    anchor_params: Optional[AnchorParameters] = None,
    classification_is_logits: bool = True,
    nms: bool = True,
    class_specific_filter: bool = True,
    score_threshold: float = 0.05,
    max_detections: int = 300,
    nms_threshold: float = 0.5,
    pre_nms_top_k: int = 1024,
    use_pallas: Optional[bool] = None,
    soft_nms_sigma: float = 0.0,
    deferred: Optional[bool] = None,
) -> Detections:
    """Full inference tail for a batch of model outputs.

    `image_shape_hw` is the STATIC padded canvas shape the batch was resized
    into — detections are in that coordinate frame; divide by the per-image
    resize scale on the host afterwards (reference: §4.2 `boxes /= scale`).

    `deferred=None` (auto) selects the deferred-decode tail for the default
    (nms + class-specific) combination: candidates are chosen on raw logits
    and only the K survivors are decoded — same results, ~GB less HBM
    traffic per large-batch step (ops/nms.py batched_detections_deferred).
    Pass False to force the legacy decode-everything order.
    """
    from tdnet.ops.nms import (
        batched_detections_deferred,
        batched_detections_deferred_shared,
        batched_filter_detections,
        default_use_pallas,
    )

    if use_pallas is None:  # Pallas kernel on TPU by default
        use_pallas = default_use_pallas()

    if deferred is None:
        # soft-NMS is per-class only (legacy shared branch ignores it —
        # keep that combination on the legacy path rather than reinterpret)
        deferred = nms and (class_specific_filter or soft_nms_sigma == 0.0)
    if deferred:
        if not nms:
            raise ValueError("deferred tail requires nms=True")
        if not class_specific_filter and soft_nms_sigma > 0.0:
            raise ValueError(
                "soft-NMS is class-specific (reference semantics)")
        anchors = jnp.asarray(
            anchors_for_shape(image_shape_hw, anchor_params=anchor_params),
            jnp.float32,
        )
        common = dict(
            classification_is_logits=classification_is_logits,
            score_threshold=score_threshold,
            max_detections=max_detections,
            nms_threshold=nms_threshold,
            pre_nms_top_k=pre_nms_top_k,
            use_pallas=use_pallas,
        )
        if class_specific_filter:
            return batched_detections_deferred(
                outputs["regression"], outputs["classification"], anchors,
                image_shape_hw, soft_nms_sigma=soft_nms_sigma, **common)
        return batched_detections_deferred_shared(
            outputs["regression"], outputs["classification"], anchors,
            image_shape_hw, **common)

    boxes = decode_boxes(outputs["regression"], image_shape_hw, anchor_params)
    scores = outputs["classification"]
    if classification_is_logits:
        scores = jax.nn.sigmoid(scores)

    return batched_filter_detections(
        boxes,
        scores,
        nms=nms,
        class_specific_filter=class_specific_filter,
        score_threshold=score_threshold,
        max_detections=max_detections,
        nms_threshold=nms_threshold,
        pre_nms_top_k=pre_nms_top_k,
        use_pallas=use_pallas,
        soft_nms_sigma=soft_nms_sigma,
    )
