"""Drawing helpers (reference: utils/visualization.py — draw_box,
draw_caption, draw_detections, draw_annotations; cv2, BGR images)."""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from tdnet.utils.colors import label_color

__all__ = ["draw_box", "draw_caption", "draw_detections", "draw_annotations"]


def draw_box(image: np.ndarray, box, color, thickness: int = 2) -> None:
    b = np.array(box).astype(int)
    cv2.rectangle(image, (b[0], b[1]), (b[2], b[3]), color, thickness, cv2.LINE_AA)


def draw_caption(image: np.ndarray, box, caption: str) -> None:
    b = np.array(box).astype(int)
    cv2.putText(image, caption, (b[0], b[1] - 10), cv2.FONT_HERSHEY_PLAIN, 1, (0, 0, 0), 2)
    cv2.putText(image, caption, (b[0], b[1] - 10), cv2.FONT_HERSHEY_PLAIN, 1, (255, 255, 255), 1)


def draw_detections(
    image: np.ndarray,
    boxes,
    scores,
    labels,
    color=None,
    label_to_name=None,
    score_threshold: float = 0.5,
) -> None:
    """Draw detections above score_threshold (reference default 0.5 for the
    fork's predict path)."""
    selection = np.where(np.asarray(scores) > score_threshold)[0]
    for i in selection:
        c = color if color is not None else label_color(int(labels[i]))
        draw_box(image, boxes[i, :], color=c)
        name = label_to_name(int(labels[i])) if label_to_name else str(int(labels[i]))
        draw_caption(image, boxes[i, :], f"{name} {float(scores[i]):.2f}")


def draw_annotations(
    image: np.ndarray, annotations: dict, color=(0, 255, 0), label_to_name=None
) -> None:
    """Draw ground-truth boxes ({'bboxes': (M,4), 'labels': (M,)})."""
    for i in range(annotations["bboxes"].shape[0]):
        label = int(annotations["labels"][i])
        c = color if color is not None else label_color(label)
        name = label_to_name(label) if label_to_name else str(label)
        draw_caption(image, annotations["bboxes"][i], name)
        draw_box(image, annotations["bboxes"][i], color=c)
