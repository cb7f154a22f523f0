"""NMS / filter_detections tests against a numpy greedy-NMS oracle
(reference: tests/layers/test_filter_detections.py style)."""

import numpy as np
import pytest

from tdnet.ops.nms import batched_filter_detections, filter_detections, non_max_suppression


def _np_greedy_nms(boxes, scores, iou_thr):
    """Exact greedy NMS, tf.image.non_max_suppression semantics."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if scores[j] > scores[i]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            iw, ih = max(0.0, xx2 - xx1), max(0.0, yy2 - yy1)
            inter = iw * ih
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = a1 + a2 - inter
            if union > 0 and inter / union > iou_thr:
                suppressed[j] = True
    mask = np.zeros(len(boxes), dtype=bool)
    mask[keep] = True
    return mask


def _random_boxes(rng, n, span=100.0):
    boxes = rng.uniform(0, span, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, (n, 2)).astype(np.float32)
    return boxes


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nms_matches_greedy_oracle(seed):
    rng = np.random.RandomState(seed)
    boxes = _random_boxes(rng, 64)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    got = np.asarray(non_max_suppression(boxes, scores, iou_threshold=0.5))
    want = _np_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(got, want)


def test_nms_suppression_chain():
    # A suppresses B, B suppresses C, A does not suppress C -> keep A and C
    # IoU(A,B)=60/140≈0.43, IoU(B,C)≈0.43, IoU(A,C)=20/180≈0.11
    boxes = np.array(
        [[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    got = np.asarray(non_max_suppression(boxes, scores, iou_threshold=0.3))
    np.testing.assert_array_equal(got, [True, False, True])


def test_filter_detections_padding_minus_one():
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32)
    cls = np.array([[0.8], [0.03]], dtype=np.float32)  # second below threshold
    det = filter_detections(boxes, cls, max_detections=5, pre_nms_top_k=2)
    assert det.boxes.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(det.boxes)[0], [0, 0, 10, 10])
    assert float(np.asarray(det.scores)[0]) == pytest.approx(0.8)
    assert int(np.asarray(det.labels)[0]) == 0
    # padded slots are all -1
    np.testing.assert_array_equal(np.asarray(det.scores)[1:], -1.0)
    np.testing.assert_array_equal(np.asarray(det.labels)[1:], -1)
    np.testing.assert_array_equal(np.asarray(det.boxes)[1:], -1.0)


def test_filter_detections_class_specific():
    # identical box in two classes: class-specific keeps both, shared keeps one
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=np.float32)
    cls = np.array([[0.9, 0.1], [0.2, 0.85]], dtype=np.float32)
    det = filter_detections(boxes, cls, class_specific_filter=True,
                            max_detections=4, pre_nms_top_k=2)
    labels = np.asarray(det.labels)
    assert set(labels[labels >= 0].tolist()) == {0, 1}

    det_shared = filter_detections(boxes, cls, class_specific_filter=False,
                                   max_detections=4, pre_nms_top_k=2)
    labels_s = np.asarray(det_shared.labels)
    # shared NMS suppresses the overlapping lower-scored anchor entirely
    assert (labels_s >= 0).sum() == 1
    assert labels_s[0] == 0


def test_filter_detections_score_ordering():
    rng = np.random.RandomState(5)
    boxes = _random_boxes(rng, 32, span=1000.0)  # spread out, little overlap
    cls = rng.uniform(0.06, 1.0, (32, 1)).astype(np.float32)
    det = filter_detections(boxes, cls, max_detections=32, pre_nms_top_k=32)
    scores = np.asarray(det.scores)
    valid = scores[scores > -1]
    assert (np.diff(valid) <= 1e-6).all()  # descending


def test_filter_detections_nms_disabled():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=np.float32)
    cls = np.array([[0.9], [0.8]], dtype=np.float32)
    det = filter_detections(boxes, cls, nms=False, max_detections=4)
    assert (np.asarray(det.scores) > 0).sum() == 2  # overlap kept without NMS


def test_batched_filter_detections():
    rng = np.random.RandomState(7)
    boxes = np.stack([_random_boxes(rng, 16) for _ in range(3)])
    cls = rng.uniform(0, 1, (3, 16, 2)).astype(np.float32)
    det = batched_filter_detections(boxes, cls, max_detections=10, pre_nms_top_k=16)
    assert det.boxes.shape == (3, 10, 4)
    assert det.scores.shape == (3, 10)
    assert det.labels.shape == (3, 10)
