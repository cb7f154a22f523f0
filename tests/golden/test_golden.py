"""Golden parity fixtures (SURVEY.md §8 'per-stage parity harness').

tests/golden/golden.npz pins the SURVEY §3 contract tensors — anchors,
corner-parameterized box transforms, focal/smooth-L1 scalars, greedy NMS
keep masks, caffe preprocessing, and the cv2-bilinear 800/1333 resize rule.
If the reference mount is ever populated, diff the same quantities computed
by the reference against this file (tools/make_golden.py documents each).
Regenerate deliberately with:  python tools/make_golden.py
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


def test_anchor_tensors(g):
    from tdnet.ops.anchors import anchors_for_shape

    for shape in [(97, 131), (64, 128)]:
        got = np.asarray(anchors_for_shape(shape), np.float64)
        np.testing.assert_array_equal(got, g[f"anchors_{shape[0]}x{shape[1]}"])


def test_box_transform_round_trip(g):
    from tdnet.ops.boxes import bbox_transform, bbox_transform_inv, clip_boxes

    deltas = np.asarray(
        bbox_transform(jnp.asarray(g["bt_anchors"]), jnp.asarray(g["bt_gts"]))
    )
    np.testing.assert_allclose(deltas, g["bt_deltas"], rtol=0, atol=1e-12)
    decoded = np.asarray(
        bbox_transform_inv(jnp.asarray(g["bt_anchors"]), jnp.asarray(deltas))
    )
    np.testing.assert_allclose(decoded, g["bt_decoded"], rtol=0, atol=1e-12)
    # decode inverts encode back to the GT boxes
    np.testing.assert_allclose(decoded, g["bt_gts"], rtol=0, atol=1e-9)
    clipped = np.asarray(
        clip_boxes(jnp.asarray(decoded)[None], (97, 131))[0]
    )
    np.testing.assert_allclose(clipped, g["bt_clipped"], rtol=0, atol=1e-12)


def test_loss_scalars(g):
    from tdnet.ops.losses import focal, smooth_l1

    got_f = float(
        focal(from_logits=True)(jnp.asarray(g["loss_labels"]),
                                jnp.asarray(g["loss_logits"]))
    )
    got_l1 = float(
        smooth_l1()(jnp.asarray(g["loss_reg_targets"]),
                    jnp.asarray(g["loss_reg_pred"]))
    )
    assert got_f == pytest.approx(float(g["loss_focal"]), rel=1e-6)
    assert got_l1 == pytest.approx(float(g["loss_smooth_l1"]), rel=1e-6)


def test_nms_keep_mask(g):
    from tdnet.ops.nms import non_max_suppression

    keep = np.asarray(
        non_max_suppression(
            jnp.asarray(g["nms_boxes"]), jnp.asarray(g["nms_scores"]), 0.5
        )
    )
    np.testing.assert_array_equal(keep, g["nms_keep"])


def test_nms_keep_mask_pallas_interpret(g):
    """The Pallas kernel reproduces the same golden keep mask (interpret
    mode on CPU)."""
    from tdnet.ops.nms import _nms_keep_presorted

    order = np.argsort(-g["nms_scores"], kind="stable")
    sboxes = jnp.asarray(g["nms_boxes"][order])
    keep_sorted = np.asarray(
        _nms_keep_presorted(
            sboxes, jnp.ones(len(order), bool), 0.5,
            use_pallas=True, pallas_interpret=True,
        )
    )
    keep = np.zeros(len(order), bool)
    keep[order] = keep_sorted
    np.testing.assert_array_equal(keep, g["nms_keep"])


def test_preprocess_and_resize(g):
    from tdnet.data.image import preprocess_image, resize_image

    pre = preprocess_image(g["img_raw"], mode="caffe")
    np.testing.assert_allclose(pre, g["img_preprocessed"], rtol=0, atol=1e-5)

    resized, scale = resize_image(pre, min_side=800, max_side=1333)
    assert scale == pytest.approx(float(g["img_scale"]))
    np.testing.assert_array_equal(np.asarray(resized.shape), g["img_resized_shape"])
    np.testing.assert_allclose(
        resized[::37, ::41, :], g["img_resized_sample"], rtol=0, atol=1e-4
    )
    assert resized.mean() == pytest.approx(float(g["img_resized_mean"]), abs=1e-4)

    small, small_scale = resize_image(pre, min_side=160, max_side=260)
    assert small_scale == pytest.approx(float(g["img_scale_small"]))
    np.testing.assert_allclose(small, g["img_resized_small"], rtol=0, atol=1e-4)
