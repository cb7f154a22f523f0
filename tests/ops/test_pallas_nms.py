"""Pallas NMS kernel vs the jnp reference implementation (interpret mode on
CPU; the real-TPU path is exercised by bench.py). Exact greedy equivalence
is the contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.ops.nms import non_max_suppression
from tdnet.ops.pallas_nms import nms_keep_sorted, pallas_nms_keep


def _random_boxes(rng, n, span=60.0):
    boxes = rng.uniform(0, span, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(3, 25, (n, 2)).astype(np.float32)
    return boxes


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_jnp_reference(seed):
    rng = np.random.RandomState(seed)
    n = 128
    boxes = _random_boxes(rng, n)  # dense overlaps: span small vs box size
    scores = rng.uniform(0, 1, n).astype(np.float32)

    want = np.asarray(non_max_suppression(boxes, scores, iou_threshold=0.5))
    got = np.asarray(
        nms_keep_sorted(boxes, scores, iou_threshold=0.5, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_multi_tile_cross_suppression():
    # 256 candidates (2 tiles) with heavy overlap chains across the tile edge
    rng = np.random.RandomState(7)
    n = 256
    boxes = _random_boxes(rng, n, span=40.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    want = np.asarray(non_max_suppression(boxes, scores, iou_threshold=0.4))
    got = np.asarray(
        nms_keep_sorted(boxes, scores, iou_threshold=0.4, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_batched():
    rng = np.random.RandomState(3)
    b, k = 3, 128
    boxes = np.stack([_random_boxes(rng, k) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, k)).astype(np.float32)
    order = np.argsort(-scores, axis=1)
    sboxes = np.take_along_axis(boxes, order[..., None], axis=1)
    valid = np.ones((b, k), bool)

    keep = np.asarray(
        pallas_nms_keep(sboxes, valid, iou_threshold=0.5, interpret=True)
    )
    for i in range(b):
        want = np.asarray(
            non_max_suppression(
                sboxes[i], np.sort(scores[i])[::-1].copy(), iou_threshold=0.5
            )
        )
        np.testing.assert_array_equal(keep[i], want)


def test_pallas_respects_valid_mask():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (128, 1))
    valid = np.zeros((1, 128), bool)
    valid[0, :4] = True  # only 4 candidates; identical boxes
    keep = np.asarray(pallas_nms_keep(boxes[None], valid, interpret=True))[0]
    assert keep[0] and not keep[1:4].any()
    assert not keep[4:].any()  # invalid slots never kept


def test_pallas_k_not_multiple_of_tile_raises():
    with pytest.raises(ValueError, match="multiple of 128"):
        pallas_nms_keep(
            np.zeros((1, 100, 4), np.float32), np.ones((1, 100), bool),
            interpret=True,
        )


def test_rows_kernel_matches_tiled_kernel():
    """pallas_nms_keep_rows (one grid step per ROW_TILE batch rows, tiles
    walked in-kernel) must be bit-identical to pallas_nms_keep, including
    non-multiple-of-ROW_TILE batch sizes (padded internally)."""
    from tdnet.ops.pallas_nms import pallas_nms_keep_rows

    r = np.random.RandomState(42)
    for b, k in [(1, 128), (3, 256), (5, 512)]:
        centers = r.uniform(0, 200, (b, k, 2))
        wh = r.uniform(5, 60, (b, k, 2))
        boxes = np.concatenate(
            [centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
        scores = r.rand(b, k).astype(np.float32)
        order = np.argsort(-scores, 1)
        sboxes = jnp.asarray(np.take_along_axis(boxes, order[..., None], 1))
        valid = jnp.asarray(np.take_along_axis(scores, order, 1) > 0.3)
        ref = pallas_nms_keep(sboxes, valid, iou_threshold=0.5,
                              interpret=True)
        got = pallas_nms_keep_rows(sboxes, valid, iou_threshold=0.5,
                                   interpret=True)
        assert np.array_equal(np.asarray(ref), np.asarray(got)), (b, k)
