"""Core ops: anchors, box transforms, IoU, losses, targets, NMS.

This layer encodes the entire behavioral contract of the reference
(SURVEY.md §3). Everything here is either trace-time numpy (anchor
generation — static per image-shape bucket) or pure jnp (differentiable /
device-side ops).
"""

from tdnet.ops.anchors import (
    AnchorParameters,
    anchors_for_shape,
    generate_anchors,
    guess_shapes,
    shift,
)
from tdnet.ops.boxes import (
    bbox_transform,
    bbox_transform_inv,
    box_iou,
    clip_boxes,
)
from tdnet.ops.losses import focal, smooth_l1
from tdnet.ops.targets import anchor_targets
from tdnet.ops.nms import filter_detections, non_max_suppression

__all__ = [
    "AnchorParameters",
    "anchors_for_shape",
    "generate_anchors",
    "guess_shapes",
    "shift",
    "bbox_transform",
    "bbox_transform_inv",
    "box_iou",
    "clip_boxes",
    "focal",
    "smooth_l1",
    "anchor_targets",
    "filter_detections",
    "non_max_suppression",
]
