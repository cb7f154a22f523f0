"""COCO 12-metric evaluator tests (pycocotools-faithful semantics)."""

import numpy as np
import pytest

from tdnet.utils.coco_eval import (
    AREA_RANGES,
    _accumulate,
    _match_image,
    evaluate_coco,
    summarize_coco,
)


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
    assert res["AR100"] == pytest.approx(1.0)
    assert res["AR1"] == pytest.approx(1.0)  # one GT per image
    # GT areas are 1600 and 3600: both 'medium' (32^2..96^2)
    assert res["AP_medium"] == pytest.approx(1.0)
    assert res["AP_small"] == -1.0  # nothing to evaluate -> COCOeval -1
    assert res["AP_large"] == -1.0


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


def test_no_detections_zero_ap():
    ds = TinyDataset()

    def predictor(image):
        return np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64)

    res = evaluate_coco(ds, predictor)
    assert res["AP"] == 0.0
    assert res["AR100"] == 0.0


def test_match_best_unmatched_gt_not_argmax():
    """pycocotools semantics (ADVICE round-1 #2): a detection whose
    highest-IoU GT is already taken still matches another GT above the
    threshold instead of counting FP."""
    # two overlapping GTs; det0 takes gt0; det1 overlaps gt0 best but gt1
    # above threshold too
    gts = np.array([
        [0.0, 0.0, 100.0, 100.0],
        [0.0, 0.0, 100.0, 140.0],
    ])
    dts = np.array([
        [0.0, 0.0, 100.0, 100.0, 0.9],   # IoU(gt0)=1.0 -> matches gt0
        [0.0, 0.0, 100.0, 110.0, 0.8],   # IoU(gt0)=0.909, IoU(gt1)=0.786
    ])
    scores, matched, ignored, npig = _match_image(
        dts, gts, AREA_RANGES["all"], max_dets=100
    )
    assert npig == 2
    # at IoU threshold 0.5 (index 0) BOTH detections match
    assert matched[0, 0] and matched[0, 1]
    assert not ignored[0].any()


def test_area_range_ignore_not_fp():
    """An unmatched detection outside the area range is ignored, and a GT
    outside the range neither counts toward npig nor turns its matching
    detection into a TP/FP."""
    gts = np.array([[0.0, 0.0, 10.0, 10.0]])        # area 100 -> small
    dts = np.array([[0.0, 0.0, 10.0, 10.0, 0.9],    # matches the small GT
                    [0.0, 0.0, 200.0, 200.0, 0.8]])  # unmatched, large area
    # evaluate under the 'small' range: GT is in range; the large unmatched
    # detection must be ignored (not FP)
    scores, matched, ignored, npig = _match_image(
        dts, gts, AREA_RANGES["small"], max_dets=100
    )
    assert npig == 1
    assert matched[0, 0]
    assert ignored[0, 1]  # large unmatched det ignored under 'small'
    aps, recalls = _accumulate([(scores, matched, ignored, npig)])
    assert aps[0] == pytest.approx(1.0)

    # under the 'large' range the GT is ignored; det0 matches the ignored GT
    # -> ignored; det1 unmatched but in range -> FP; npig 0 -> NaN metrics
    scores, matched, ignored, npig = _match_image(
        dts, gts, AREA_RANGES["large"], max_dets=100
    )
    assert npig == 0
    assert ignored[0, 0]
    aps, recalls = _accumulate([(scores, matched, ignored, npig)])
    assert np.all(np.isnan(aps))


def test_maxdets_truncation_prefix_stable():
    gts = np.array([[0.0, 0.0, 50.0, 50.0], [60.0, 60.0, 100.0, 100.0]])
    dts = np.array([
        [0.0, 0.0, 50.0, 50.0, 0.9],
        [60.0, 60.0, 100.0, 100.0, 0.8],
    ])
    r100 = _match_image(dts, gts, AREA_RANGES["all"], max_dets=100)
    _, rec1 = _accumulate([r100], max_dets=1)
    _, rec100 = _accumulate([r100], max_dets=100)
    assert rec1[0] == pytest.approx(0.5)   # only the top det counts
    assert rec100[0] == pytest.approx(1.0)


def test_summary_block_format():
    res = {k: 0.5 for k in
           ["AP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large",
            "AR1", "AR10", "AR100", "AR_small", "AR_medium", "AR_large"]}
    text = summarize_coco(res)
    lines = text.splitlines()
    assert len(lines) == 12
    assert "Average Precision" in lines[0] and "= 0.500" in lines[0]
    assert "maxDets=  1" in lines[6]


def test_vectorized_matcher_equals_reference_scan():
    """Property test: the vectorized gi selection must reproduce the
    original COCOeval ascending scan (>= updates, break-on-ignored) on
    random inputs, including ties and area-range ignores."""
    rng = np.random.RandomState(42)
    for trial in range(200):
        D = rng.randint(0, 8)
        G = rng.randint(0, 8)
        centers = rng.uniform(0, 60, (max(D, 1), 2))
        dts = np.concatenate(
            [centers, centers + rng.uniform(5, 40, (max(D, 1), 2)),
             rng.uniform(0, 1, (max(D, 1), 1))], axis=1)[:D]
        gc = rng.uniform(0, 60, (max(G, 1), 2))
        gts = np.concatenate(
            [gc, gc + rng.uniform(5, 40, (max(G, 1), 2))], axis=1)[:G]
        # quantize coords to force frequent exact IoU ties
        dts[:, :4] = np.round(dts[:, :4] / 10) * 10
        gts = np.round(gts / 10) * 10
        area_name = list(AREA_RANGES)[trial % 4]
        got = _match_image(dts, gts, AREA_RANGES[area_name], max_dets=100)

        # reference: the literal COCOeval scan
        from tdnet.utils.coco_eval import (
            COCO_IOU_THRESHOLDS, _box_area, _iou_exact)
        gt_area = _box_area(gts)
        lo, hi = AREA_RANGES[area_name]
        gt_ignore = (gt_area < lo) | (gt_area > hi)
        order = np.argsort(gt_ignore, kind="stable")
        gts_s = gts[order]
        gt_ig = gt_ignore[order]
        T = len(COCO_IOU_THRESHOLDS)
        matched = np.zeros((T, D), bool)
        ignored = np.zeros((T, D), bool)
        if D and G:
            ious = _iou_exact(dts[:, :4].astype(np.float64),
                              gts_s.astype(np.float64))
            for ti, thr in enumerate(COCO_IOU_THRESHOLDS):
                taken = np.zeros(G, bool)
                for di in range(D):
                    best = min(thr, 1.0 - 1e-10)
                    m = -1
                    for gi in range(G):
                        if taken[gi]:
                            continue
                        if m > -1 and not gt_ig[m] and gt_ig[gi]:
                            break
                        if ious[di, gi] < best:
                            continue
                        best = ious[di, gi]
                        m = gi
                    if m == -1:
                        continue
                    taken[m] = True
                    matched[ti, di] = True
                    ignored[ti, di] = gt_ig[m]
        if D:
            dt_area = _box_area(dts[:, :4])
            oor = (dt_area < lo) | (dt_area > hi)
            ignored |= (~matched) & oor[None, :]

        np.testing.assert_array_equal(got[1], matched,
                                      err_msg=f"trial {trial} matched")
        np.testing.assert_array_equal(got[2], ignored,
                                      err_msg=f"trial {trial} ignored")
        assert got[3] == int(np.sum(~gt_ignore))
