"""Anchor target assignment tests against a numpy oracle of the reference's
anchor_targets_bbox (utils/anchors.py) — same thresholds, same +1 IoU."""

import numpy as np

from tdnet.native import compute_overlap
from tdnet.ops.anchors import anchors_for_shape
from tdnet.ops.targets import anchor_targets, batched_anchor_targets


def _np_anchor_targets(anchors, gt_boxes, gt_labels, image_hw, num_classes,
                       neg=0.4, pos=0.5):
    n = anchors.shape[0]
    labels = np.zeros((n, num_classes + 1), dtype=np.float32)
    regression = np.zeros((n, 5), dtype=np.float32)
    if len(gt_boxes):
        overlaps = compute_overlap(anchors.astype(np.float64), gt_boxes.astype(np.float64))
        argmax = overlaps.argmax(axis=1)
        mx = overlaps[np.arange(n), argmax]
        positive = mx >= pos
        ignore = (mx > neg) & ~positive
        labels[ignore, -1] = -1
        labels[positive, -1] = 1
        regression[ignore, -1] = -1
        regression[positive, -1] = 1
        for i in np.where(positive)[0]:
            labels[i, gt_labels[argmax[i]]] = 1
            a = anchors[i]
            g = gt_boxes[argmax[i]]
            aw, ah = a[2] - a[0], a[3] - a[1]
            t = np.array([(g[0] - a[0]) / aw, (g[1] - a[1]) / ah,
                          (g[2] - a[2]) / aw, (g[3] - a[3]) / ah]) / 0.2
            regression[i, :4] = t
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    outside = (cx >= image_hw[1]) | (cy >= image_hw[0])
    labels[outside, -1] = -1
    regression[outside, -1] = -1
    return labels, regression


def test_targets_match_oracle():
    anchors = anchors_for_shape((128, 128)).astype(np.float32)
    gt = np.array([[10.0, 10.0, 50.0, 60.0], [70.0, 80.0, 120.0, 120.0]], dtype=np.float32)
    gt_labels = np.array([0, 1], dtype=np.int32)
    mask = np.array([True, True])
    hw = np.array([128.0, 128.0], dtype=np.float32)

    labels, reg = anchor_targets(anchors, gt, gt_labels, mask, hw, num_classes=2)
    labels, reg = np.asarray(labels), np.asarray(reg)
    want_labels, want_reg = _np_anchor_targets(anchors, gt, gt_labels, hw, 2)

    np.testing.assert_array_equal(labels[:, -1], want_labels[:, -1])
    np.testing.assert_array_equal(reg[:, -1], want_reg[:, -1])
    pos = want_labels[:, -1] == 1
    assert pos.sum() > 0, "fixture must produce positives"
    np.testing.assert_array_equal(labels[pos, :-1], want_labels[pos, :-1])
    np.testing.assert_allclose(reg[pos, :4], want_reg[pos, :4], rtol=1e-4, atol=1e-4)


def test_targets_no_gt_all_negative():
    anchors = anchors_for_shape((64, 64)).astype(np.float32)
    gt = np.zeros((4, 4), dtype=np.float32)
    labels, reg = anchor_targets(
        anchors, gt, np.zeros(4, np.int32), np.zeros(4, bool),
        np.array([64.0, 64.0]), num_classes=1,
    )
    labels = np.asarray(labels)
    assert (labels[:, -1] <= 0).all()  # nothing positive/ignored by IoU
    assert (labels[:, 0] == 0).all()
    assert not np.asarray(reg)[:, :4].any()


def test_targets_center_outside_padded_region_ignored():
    # anchors for a padded 128x128 canvas, actual image only 64x64
    anchors = anchors_for_shape((128, 128)).astype(np.float32)
    labels, _ = anchor_targets(
        anchors, np.zeros((1, 4), np.float32), np.zeros(1, np.int32),
        np.zeros(1, bool), np.array([64.0, 64.0]), num_classes=1,
    )
    labels = np.asarray(labels)
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    outside = (cx >= 64) | (cy >= 64)
    assert (labels[outside, -1] == -1).all()
    assert (labels[~outside, -1] == 0).all()


def test_padded_gt_slots_never_match():
    anchors = anchors_for_shape((64, 64)).astype(np.float32)
    # slot 1 is garbage (all zeros would overlap tiny anchors heavily with +1)
    gt = np.array([[10.0, 10.0, 40.0, 40.0], [0.0, 0.0, 63.0, 63.0]], dtype=np.float32)
    mask = np.array([True, False])
    labels_m, _ = anchor_targets(
        anchors, gt, np.array([0, 0], np.int32), mask,
        np.array([64.0, 64.0]), num_classes=1,
    )
    labels_o, _ = _np_anchor_targets(
        anchors, gt[:1], np.array([0], np.int32), (64, 64), 1,
    )
    np.testing.assert_array_equal(np.asarray(labels_m)[:, -1], labels_o[:, -1])


def test_batched_targets_shapes():
    anchors = anchors_for_shape((64, 64)).astype(np.float32)
    b, m = 3, 5
    gt = np.tile(np.array([[10.0, 10.0, 40.0, 40.0]], np.float32), (b, m, 1)).reshape(b, m, 4)
    labels, reg = batched_anchor_targets(
        anchors, gt, np.zeros((b, m), np.int32), np.ones((b, m), bool),
        np.tile(np.array([64.0, 64.0], np.float32), (b, 1)), num_classes=1,
    )
    assert labels.shape == (b, anchors.shape[0], 2)
    assert reg.shape == (b, anchors.shape[0], 5)
