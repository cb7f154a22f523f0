"""COCO-style mAP@[.5:.95] evaluator tests."""

import numpy as np
import pytest

from tdnet.utils.coco_eval import _ap_101, evaluate_coco


class TinyDataset:
    def __init__(self):
        self.gt = {0: np.array([[10.0, 10.0, 50.0, 50.0]]),
                   1: np.array([[20.0, 30.0, 80.0, 90.0]])}

    def size(self):
        return 2

    def num_classes(self):
        return 1

    def has_label(self, label):
        return label == 0

    def label_to_name(self, label):
        return "table"

    def load_image(self, i):
        return np.zeros((100, 100, 3), np.float32) + i

    def load_annotations(self, i):
        return {"bboxes": self.gt[i], "labels": np.zeros(len(self.gt[i]), np.int64)}


def test_perfect_predictor_ap_one():
    ds = TinyDataset()

    def predictor(image):
        i = int(image[0, 0, 0])
        return ds.gt[i], np.full(len(ds.gt[i]), 0.9), np.zeros(len(ds.gt[i]), np.int64)

    res = evaluate_coco(ds, predictor)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(1.0)
    assert res["AP_table"] == pytest.approx(1.0)


def test_loose_boxes_pass_low_iou_only():
    ds = TinyDataset()

    def predictor(image):
        i = int(image[0, 0, 0])
        b = ds.gt[i].copy()
        b[:, 2] += (b[:, 2] - b[:, 0]) * 0.45  # stretch: IoU ~0.69 exact
        return b, np.full(len(b), 0.9), np.zeros(len(b), np.int64)

    res = evaluate_coco(ds, predictor)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert 0.2 < res["AP"] < 0.8  # some thresholds pass, some fail


def test_ap_101_monotone_envelope():
    assert _ap_101(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    # precision recovers later: envelope back-fills
    ap = _ap_101(np.array([0.5, 1.0]), np.array([0.5, 0.8]))
    assert ap == pytest.approx(np.mean([0.8] * 101), abs=0.02)


def test_no_detections_zero_ap():
    ds = TinyDataset()

    def predictor(image):
        return np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64)

    res = evaluate_coco(ds, predictor)
    assert res["AP"] == 0.0
