"""Soft-NMS tests against a numpy greedy oracle."""

import numpy as np
import pytest

from tdnet.ops.nms import filter_detections
from tdnet.ops.soft_nms import soft_nms_rescore


def _np_soft_nms(boxes, scores, sigma, score_threshold, max_sel):
    scores = scores.copy().astype(np.float64)
    out = np.zeros_like(scores)
    remaining = np.where(scores > score_threshold, scores, -np.inf)
    for _ in range(max_sel):
        i = int(np.argmax(remaining))
        if remaining[i] <= score_threshold:
            break
        out[i] = remaining[i]
        # gaussian decay of everyone by IoU with i
        for j in range(len(scores)):
            if j == i or remaining[j] == -np.inf:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            iw, ih = max(0.0, xx2 - xx1), max(0.0, yy2 - yy1)
            inter = iw * ih
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a1 + a2 - inter) if a1 + a2 - inter > 0 else 0.0
            remaining[j] *= np.exp(-(iou ** 2) / sigma)
        remaining[i] = -np.inf
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_soft_nms_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    n = 32
    boxes = rng.uniform(0, 60, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 25, (n, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    got = np.asarray(
        soft_nms_rescore(boxes, scores, sigma=0.5, score_threshold=0.001,
                         max_selections=n)
    )
    want = _np_soft_nms(boxes, scores, 0.5, 0.001, n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_soft_nms_decays_overlaps_keeps_far():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    out = np.asarray(soft_nms_rescore(boxes, scores, sigma=0.5))
    assert out[0] == pytest.approx(0.9)
    assert 0 < out[1] < 0.8  # decayed, not killed
    assert out[2] == pytest.approx(0.7)  # no overlap, untouched


def test_filter_detections_soft_nms_path():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    cls = np.array([[0.9], [0.8]], np.float32)
    det = filter_detections(
        boxes, cls, soft_nms_sigma=0.5, max_detections=4, pre_nms_top_k=2
    )
    s = np.asarray(det.scores)
    # both kept (soft), second decayed below 0.8 but above threshold
    assert (s > 0).sum() == 2
    assert s[0] == pytest.approx(0.9, abs=1e-5)
    assert 0.05 < s[1] < 0.8


def test_batched_pallas_soft_nms_matches_vmapped_path():
    """batched_filter_detections with use_pallas must produce the same
    detections as the vmapped per-class jnp path when soft-NMS is on
    (the Pallas greedy-rescoring kernel, ops/soft_nms.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdnet.ops.nms import batched_filter_detections

    rng = np.random.RandomState(7)
    b, n, c = 3, 400, 2
    centers = rng.uniform(0, 200, (b, n, 2))
    sizes = rng.uniform(10, 60, (b, n, 2))
    boxes = jnp.asarray(np.concatenate([centers, centers + sizes], -1),
                        jnp.float32)
    scores = jnp.asarray(rng.uniform(0, 1, (b, n, c)) ** 3, jnp.float32)

    kwargs = dict(score_threshold=0.05, max_detections=50,
                  pre_nms_top_k=256, soft_nms_sigma=0.5)
    ref = batched_filter_detections(boxes, scores, use_pallas=False, **kwargs)
    got = batched_filter_detections(boxes, scores, use_pallas=True,
                                    pallas_interpret=True, **kwargs)

    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.labels), np.asarray(ref.labels))
    np.testing.assert_allclose(np.asarray(got.boxes), np.asarray(ref.boxes),
                               rtol=1e-5, atol=1e-4)


def test_rescore_batched_matches_vmapped_rescore():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdnet.ops.soft_nms import soft_nms_rescore, soft_nms_rescore_batched

    rng = np.random.RandomState(1)
    r, k = 5, 130  # non-multiple of 128 exercises the pad path
    centers = rng.uniform(0, 100, (r, k, 2))
    sizes = rng.uniform(5, 30, (r, k, 2))
    boxes = jnp.asarray(np.concatenate([centers, centers + sizes], -1),
                        jnp.float32)
    scores = jnp.asarray(
        rng.uniform(0, 1, (r, k)) * (rng.rand(r, k) > 0.3), jnp.float32)

    for method in ("gaussian", "linear"):
        ref = jax.vmap(
            lambda bx, s: soft_nms_rescore(bx, s, method=method, sigma=0.4,
                                           max_selections=64)
        )(boxes, scores)
        got = soft_nms_rescore_batched(boxes, scores, method=method,
                                       sigma=0.4, max_selections=64,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
