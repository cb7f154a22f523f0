"""VOC-style mAP evaluation (host side).

Behavioral contract (SURVEY.md §3 "Inference/eval"; reference:
keras_retinanet/utils/eval.py ~L1-230):

- per image: keep detections with score > score_threshold (0.05), cap at
  max_detections (100) by score;
- per class: sort detections by descending score, greedily match each against
  unmatched GT with IoU >= iou_threshold (0.5, legacy +1 IoU via the native
  compute_overlap analog); double matches count as FP;
- AP via VOC all-points interpolation (_compute_ap);
- returns {label: (ap, num_annotations)}; the fork's single 'table' class
  makes mAP == AP_table.

The predictor is any callable mapping a raw BGR image to
(boxes, scores, labels) in ORIGINAL image coordinates — the device pipeline
is injected by bin/evaluate.py (see tdnet/train/predictor.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from tdnet.native import compute_overlap

__all__ = ["evaluate", "compute_ap"]


def compute_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """VOC all-points AP (reference: utils/eval.py _compute_ap)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _get_detections(dataset, predictor, score_threshold, max_detections,
                    shard=False):
    """Collect per-(image, class) detection arrays from the predictor.

    shard=True + an initialized jax.distributed runtime: each process
    predicts only its strided slice of the dataset (prediction is the
    expensive part) and the filtered detection rows are all-gathered
    (parallel/mesh.py process_allgather_rows), so every process returns the
    IDENTICAL full detection set — downstream matching/AP is bit-identical
    to a single-process run (tested in tests/parallel/).
    """
    import jax

    num_classes = dataset.num_classes()
    nproc = jax.process_count() if shard else 1
    rank = jax.process_index() if shard else 0
    my_images = list(range(rank, dataset.size(), nproc))
    all_detections = [
        [None for _ in range(num_classes)] for _ in range(dataset.size())
    ]

    # Batched path: a Predictor exposing predict_batch runs one device
    # dispatch per shape bucket per chunk instead of the reference's
    # per-image predict_on_batch loop (SURVEY.md §4.3) — same results,
    # ~batch_size x fewer dispatches.
    batch_size = int(getattr(predictor, "batch_size", 1) or 1)
    predict_batch = getattr(predictor, "predict_batch", None)

    def record(i, boxes, scores, labels):
        boxes = np.asarray(boxes, np.float64)
        scores = np.asarray(scores, np.float64)
        labels = np.asarray(labels, np.int64)
        keep = scores > score_threshold
        boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
        order = np.argsort(-scores, kind="stable")[:max_detections]
        boxes, scores, labels = boxes[order], scores[order], labels[order]
        dets = np.concatenate([boxes, scores[:, None]], axis=1)
        for label in range(num_classes):
            if dataset.has_label(label):
                all_detections[i][label] = dets[labels == label]

    if predict_batch is not None and batch_size > 1:
        for start in range(0, len(my_images), batch_size):
            idxs = my_images[start:start + batch_size]
            images = [dataset.load_image(i) for i in idxs]
            for i, (boxes, scores, labels) in zip(idxs, predict_batch(images)):
                record(i, boxes, scores, labels)
    else:
        for i in my_images:
            boxes, scores, labels = predictor(dataset.load_image(i))
            record(i, boxes, scores, labels)

    if nproc > 1:
        from tdnet.parallel.mesh import process_allgather_rows

        # encode (image, label, x1, y1, x2, y2, score) rows in local record
        # order (per-image score-descending), gather, rebuild — relative
        # order per (image, label) survives, so matching is bit-identical
        rows = []
        for i in my_images:
            for label in range(num_classes):
                d = all_detections[i][label]
                if d is None or d.shape[0] == 0:
                    continue
                meta = np.full((d.shape[0], 2), (i, label), np.float64)
                rows.append(np.concatenate([meta, d], axis=1))
        local = (
            np.concatenate(rows, axis=0)
            if rows else np.zeros((0, 7), np.float64)
        )
        gathered = process_allgather_rows(local)
        for i in range(dataset.size()):
            img_rows = gathered[gathered[:, 0] == i]
            for label in range(num_classes):
                if dataset.has_label(label):
                    all_detections[i][label] = img_rows[
                        img_rows[:, 1] == label][:, 2:]
    return all_detections


def _get_annotations(dataset):
    num_classes = dataset.num_classes()
    all_annotations = [
        [None for _ in range(num_classes)] for _ in range(dataset.size())
    ]
    for i in range(dataset.size()):
        ann = dataset.load_annotations(i)
        for label in range(num_classes):
            if dataset.has_label(label):
                all_annotations[i][label] = ann["bboxes"][
                    ann["labels"] == label
                ].copy()
    return all_annotations


def evaluate(
    dataset,
    predictor: Callable,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.05,
    max_detections: int = 100,
    shard: bool = False,
) -> Dict[int, Tuple[float, int]]:
    """Evaluate a predictor over a dataset -> {label: (AP, num_annotations)}.

    shard=True splits PREDICTION across jax processes (strided) and
    all-gathers the detections — every process returns the identical,
    bit-exact result of a single-process run (see _get_detections)."""
    all_detections = _get_detections(
        dataset, predictor, score_threshold, max_detections, shard=shard)
    all_annotations = _get_annotations(dataset)
    average_precisions: Dict[int, Tuple[float, int]] = {}

    for label in range(dataset.num_classes()):
        if not dataset.has_label(label):
            continue
        false_positives = []
        true_positives = []
        scores = []
        num_annotations = 0.0

        for i in range(dataset.size()):
            detections = all_detections[i][label]
            annotations = all_annotations[i][label]
            num_annotations += annotations.shape[0]
            n_det = detections.shape[0]
            if n_det == 0:
                continue
            scores.extend(detections[:, 4].tolist())
            if annotations.shape[0] == 0:
                false_positives.extend([1] * n_det)
                true_positives.extend([0] * n_det)
                continue
            # one DxG IoU call per (image, class); the reference calls the
            # native kernel once per detection (utils/eval.py ~L80) — the
            # greedy scan is identical because each detection's argmax GT
            # does not depend on the match state (taken argmax GT -> FP)
            overlaps = compute_overlap(detections[:, :4], annotations)
            assigned = np.argmax(overlaps, axis=1)
            max_overlap = overlaps[np.arange(n_det), assigned]
            detected: set = set()
            for di in range(n_det):
                if max_overlap[di] >= iou_threshold and assigned[di] not in detected:
                    true_positives.append(1)
                    false_positives.append(0)
                    detected.add(int(assigned[di]))
                else:
                    false_positives.append(1)
                    true_positives.append(0)

        if num_annotations == 0:
            average_precisions[label] = (0.0, 0)
            continue

        scores = np.asarray(scores)
        order = np.argsort(-scores, kind="stable")
        false_positives = np.cumsum(np.asarray(false_positives)[order])
        true_positives = np.cumsum(np.asarray(true_positives)[order])

        recall = true_positives / num_annotations
        precision = true_positives / np.maximum(
            true_positives + false_positives, np.finfo(np.float64).eps
        )
        average_precisions[label] = (
            compute_ap(recall, precision),
            int(num_annotations),
        )
    return average_precisions
