"""Box transform / IoU golden tests (SURVEY.md §3 contract)."""

import numpy as np

from tdnet.native import compute_overlap
from tdnet.ops.boxes import bbox_transform, bbox_transform_inv, box_iou, clip_boxes


def test_bbox_transform_hand_computed():
    anchors = np.array([[0.0, 0.0, 10.0, 20.0]], dtype=np.float32)
    gt = np.array([[1.0, 2.0, 12.0, 18.0]], dtype=np.float32)
    t = np.asarray(bbox_transform(anchors, gt))
    # ((1-0)/10, (2-0)/20, (12-10)/10, (18-20)/20) / 0.2
    np.testing.assert_allclose(t[0], [0.5, 0.5, 1.0, -0.5], rtol=1e-6)


def test_bbox_roundtrip():
    rng = np.random.RandomState(0)
    anchors = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(1, 50, (64, 2)).astype(np.float32)
    gt = anchors + rng.uniform(-3, 3, (64, 4)).astype(np.float32)
    deltas = bbox_transform(anchors, gt)
    back = np.asarray(bbox_transform_inv(anchors, deltas))
    np.testing.assert_allclose(back, gt, rtol=1e-4, atol=1e-3)


def test_bbox_transform_inv_batched():
    anchors = np.array([[[0.0, 0.0, 10.0, 10.0]]], dtype=np.float32)  # (1,1,4)
    deltas = np.array([[[1.0, 0.0, 0.0, 1.0]]], dtype=np.float32)
    out = np.asarray(bbox_transform_inv(anchors, deltas))
    # x1 + 1*0.2*10 = 2 ; y2 + 1*0.2*10 = 12
    np.testing.assert_allclose(out[0, 0], [2.0, 0.0, 10.0, 12.0], rtol=1e-6)


def test_clip_boxes():
    boxes = np.array([[-5.0, -2.0, 120.0, 90.0], [1.0, 2.0, 3.0, 4.0]], dtype=np.float32)
    out = np.asarray(clip_boxes(boxes, (80, 100)))
    np.testing.assert_allclose(out[0], [0, 0, 100, 80])
    np.testing.assert_allclose(out[1], [1, 2, 3, 4])


def test_iou_exact_hand_computed():
    a = np.array([[0.0, 0.0, 10.0, 10.0]], dtype=np.float32)
    b = np.array([[5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]], dtype=np.float32)
    iou = np.asarray(box_iou(a, b, mode="exact"))
    np.testing.assert_allclose(iou[0, 0], 25.0 / 175.0, rtol=1e-6)
    assert iou[0, 1] == 0.0


def test_iou_legacy_matches_native():
    rng = np.random.RandomState(1)
    n, k = 200, 37
    boxes = rng.uniform(0, 200, (n, 4))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(1, 80, (n, 2))
    queries = rng.uniform(0, 200, (k, 4))
    queries[:, 2:] = queries[:, :2] + rng.uniform(1, 80, (k, 2))

    native = compute_overlap(boxes, queries)
    device = np.asarray(box_iou(boxes.astype(np.float32), queries.astype(np.float32), mode="legacy"))
    np.testing.assert_allclose(device, native, rtol=1e-4, atol=1e-5)


def test_native_overlap_identity():
    b = np.array([[0.0, 0.0, 9.0, 9.0]])
    out = compute_overlap(b, b)
    np.testing.assert_allclose(out, [[1.0]])


def test_native_overlap_empty():
    b = np.zeros((0, 4))
    q = np.array([[0.0, 0.0, 1.0, 1.0]])
    assert compute_overlap(b, q).shape == (0, 1)
