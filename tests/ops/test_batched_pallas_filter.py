"""Batched Pallas filter path must equal the vmapped jnp path exactly."""

import numpy as np

from tdnet.ops.nms import batched_filter_detections


def _random_scene(rng, b, n, c):
    boxes = rng.uniform(0, 80, (b, n, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(4, 30, (b, n, 2)).astype(np.float32)
    cls = rng.uniform(0, 1, (b, n, c)).astype(np.float32)
    return boxes, cls


def test_pallas_batched_filter_matches_jnp():
    rng = np.random.RandomState(11)
    boxes, cls = _random_scene(rng, 2, 64, 2)
    kwargs = dict(max_detections=20, pre_nms_top_k=64, score_threshold=0.05)

    ref = batched_filter_detections(boxes, cls, use_pallas=False, **kwargs)
    got = batched_filter_detections(
        boxes, cls, use_pallas=True, pallas_interpret=True, **kwargs
    )

    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.labels), np.asarray(ref.labels))
    np.testing.assert_allclose(np.asarray(got.boxes), np.asarray(ref.boxes), atol=1e-5)


def test_pallas_batched_filter_per_class_cap():
    # many spread-out boxes in one class: per-class cap must apply
    rng = np.random.RandomState(5)
    boxes = rng.uniform(0, 5000, (1, 128, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 10
    cls = rng.uniform(0.5, 1.0, (1, 128, 1)).astype(np.float32)

    det = batched_filter_detections(
        boxes, cls, use_pallas=True, pallas_interpret=True,
        max_detections=10, pre_nms_top_k=128,
    )
    assert (np.asarray(det.scores) > 0).sum() == 10
    s = np.asarray(det.scores)[0]
    assert (np.diff(s[s > 0]) <= 1e-6).all()
