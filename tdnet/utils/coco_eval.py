"""COCO-style evaluation: mAP averaged over IoU 0.50:0.95 (reference:
utils/coco_eval.py evaluate_coco).

pycocotools is not in this image (zero egress), so the metric is computed
directly: per IoU threshold, the same greedy score-ordered matching as the
VOC evaluator (utils/eval.py) but with 101-point interpolated AP (COCO's
convention), averaged over thresholds 0.50:0.05:0.95. For the single-class
table task this is AP@[.5:.95] of class 'table'.

Also reports AP50/AP75 like the COCOeval summary.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from tdnet.native import compute_overlap
from tdnet.utils.eval import _get_annotations, _get_detections

__all__ = ["evaluate_coco"]

COCO_IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def _ap_101(recall: np.ndarray, precision: np.ndarray) -> float:
    """COCO 101-point interpolated AP."""
    if recall.size == 0:
        return 0.0
    mpre = precision.copy()
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    points = np.linspace(0.0, 1.0, 101)
    idx = np.searchsorted(recall, points, side="left")
    return float(np.mean(np.where(idx < mpre.size, mpre[np.minimum(idx, mpre.size - 1)], 0.0)))


def _class_ap_at_iou(detections, annotations, iou_threshold):
    """Greedy-matched AP for one class at one IoU threshold."""
    scores, tp, fp = [], [], []
    num_annotations = 0
    for dets, anns in zip(detections, annotations):
        num_annotations += anns.shape[0]
        detected = []
        for d in dets:
            scores.append(d[4])
            if anns.shape[0] == 0:
                fp.append(1)
                tp.append(0)
                continue
            overlaps = compute_overlap(np.expand_dims(d[:4], 0), anns)
            assigned = int(np.argmax(overlaps))
            if overlaps[0, assigned] >= iou_threshold and assigned not in detected:
                tp.append(1)
                fp.append(0)
                detected.append(assigned)
            else:
                fp.append(1)
                tp.append(0)

    if num_annotations == 0:
        return None, 0
    order = np.argsort(-np.asarray(scores), kind="stable")
    tp = np.cumsum(np.asarray(tp)[order])
    fp = np.cumsum(np.asarray(fp)[order])
    recall = tp / num_annotations
    precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return _ap_101(recall, precision), num_annotations


def evaluate_coco(
    dataset,
    predictor: Callable,
    score_threshold: float = 0.05,
    max_detections: int = 100,
) -> Dict[str, float]:
    """Returns {'AP': .., 'AP50': .., 'AP75': .., per-class 'AP_<name>': ..}."""
    all_detections = _get_detections(dataset, predictor, score_threshold, max_detections)
    all_annotations = _get_annotations(dataset)

    per_class: Dict[int, list] = {}
    for label in range(dataset.num_classes()):
        if not dataset.has_label(label):
            continue
        dets = [all_detections[i][label] for i in range(dataset.size())]
        anns = [all_annotations[i][label] for i in range(dataset.size())]
        aps = []
        for thr in COCO_IOU_THRESHOLDS:
            ap, n = _class_ap_at_iou(dets, anns, thr)
            if ap is None:
                aps = None
                break
            aps.append(ap)
        if aps is not None:
            per_class[label] = aps

    result: Dict[str, float] = {}
    if per_class:
        stacked = np.asarray(list(per_class.values()))  # (C, T)
        result["AP"] = float(stacked.mean())
        result["AP50"] = float(stacked[:, 0].mean())
        result["AP75"] = float(stacked[:, 5].mean())
        for label, aps in per_class.items():
            result[f"AP_{dataset.label_to_name(label)}"] = float(np.mean(aps))
    else:
        result.update({"AP": 0.0, "AP50": 0.0, "AP75": 0.0})
    return result
