"""mAP evaluator tests with a scripted predictor (reference parity: greedy
matching, double-match FP, VOC all-points AP)."""

import numpy as np
import pytest

from tdnet.utils.eval import compute_ap, evaluate


class TinyDataset:
    """Two images, one class; GT known."""

    def __init__(self):
        self.gt = {
            0: np.array([[10.0, 10.0, 50.0, 50.0], [100.0, 100.0, 150.0, 140.0]]),
            1: np.array([[20.0, 30.0, 80.0, 90.0]]),
        }

    def size(self):
        return 2

    def num_classes(self):
        return 1

    def has_label(self, label):
        return label == 0

    def load_image(self, i):
        return np.zeros((200, 200, 3), np.float32) + i

    def load_annotations(self, i):
        return {"bboxes": self.gt[i], "labels": np.zeros(len(self.gt[i]), np.int64)}


def test_perfect_predictor_ap_one():
    ds = TinyDataset()

    def predictor(image):
        i = int(image[0, 0, 0])
        boxes = ds.gt[i]
        return boxes, np.full(len(boxes), 0.9), np.zeros(len(boxes), np.int64)

    aps = evaluate(ds, predictor)
    ap, n = aps[0]
    assert n == 3
    assert ap == pytest.approx(1.0)


def test_missed_and_false_positive():
    ds = TinyDataset()

    def predictor(image):
        i = int(image[0, 0, 0])
        if i == 0:
            # one perfect match + one far-away FP, miss the second GT
            boxes = np.array([[10.0, 10.0, 50.0, 50.0], [0.0, 150.0, 30.0, 180.0]])
            return boxes, np.array([0.9, 0.8]), np.zeros(2, np.int64)
        return np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64)

    ap, n = evaluate(ds, predictor)[0]
    assert n == 3
    # precision at rank1 = 1, rank2 = 0.5; recall caps at 1/3
    assert ap == pytest.approx(1.0 / 3.0)


def test_double_detection_counts_fp():
    ds = TinyDataset()

    def predictor(image):
        i = int(image[0, 0, 0])
        if i == 1:
            boxes = np.array([[20.0, 30.0, 80.0, 90.0], [21.0, 31.0, 81.0, 91.0]])
            return boxes, np.array([0.9, 0.85]), np.zeros(2, np.int64)
        return np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64)

    ap, _ = evaluate(ds, predictor)[0]
    # second (lower-score) match on an already-matched GT is a FP
    assert 0 < ap < 0.5


def test_score_threshold_filters():
    ds = TinyDataset()

    def predictor(image):
        i = int(image[0, 0, 0])
        boxes = ds.gt[i]
        return boxes, np.full(len(boxes), 0.01), np.zeros(len(boxes), np.int64)

    ap, _ = evaluate(ds, predictor, score_threshold=0.05)[0]
    assert ap == 0.0  # everything below threshold


def test_compute_ap_known_values():
    # single detection covering the single GT: P=[1], R=[1] -> AP=1
    assert compute_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    # P=[1, 0.5], R=[0.5, 0.5]: AP = 0.5*1 (all-points)
    assert compute_ap(np.array([0.5, 0.5]), np.array([1.0, 0.5])) == pytest.approx(0.5)
    # monotone envelope: later higher precision back-fills
    ap = compute_ap(np.array([0.5, 1.0]), np.array([0.5, 0.6]))
    assert ap == pytest.approx(0.6)
