"""Deferred-decode inference tail == legacy decode-everything tail, exactly.

batched_detections_deferred reorders the tail (top-k on raw logits, decode
only candidates) — every arm must be BIT-identical to the legacy path it
replaces (same reference semantics: filter_detections.py, SURVEY.md §3).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.models.detect import detections_from_outputs

BUCKET = (64, 96)  # tiny canvas -> N = 1134 anchors (fast on CPU)


def _outputs(rng, b, c, bucket=BUCKET, spread=1.5, bias=-3.0):
    from tdnet.ops.anchors import anchors_for_shape

    n = anchors_for_shape(bucket).shape[0]
    reg = rng.randn(b, n, 4).astype(np.float32) * 0.1
    cls = (rng.randn(b, n, c) * spread + bias).astype(np.float32)
    return {"regression": jnp.asarray(reg), "classification": jnp.asarray(cls)}


def _assert_equal(got, ref):
    np.testing.assert_array_equal(np.asarray(got.scores), np.asarray(ref.scores))
    np.testing.assert_array_equal(np.asarray(got.labels), np.asarray(ref.labels))
    np.testing.assert_array_equal(np.asarray(got.boxes), np.asarray(ref.boxes))


@pytest.mark.parametrize("classes", [1, 3])
@pytest.mark.parametrize("k", [256, 2048])
def test_deferred_equals_legacy_jnp(classes, k):
    outputs = _outputs(np.random.RandomState(7), 3, classes)
    common = dict(image_shape_hw=BUCKET, pre_nms_top_k=k, use_pallas=False)
    ref = detections_from_outputs(outputs, deferred=False, **common)
    got = detections_from_outputs(outputs, deferred=True, **common)
    _assert_equal(got, ref)


def test_deferred_pallas_kernel_arm():
    outputs = _outputs(np.random.RandomState(3), 2, 2)
    from tdnet.ops.anchors import anchors_for_shape
    from tdnet.ops.nms import batched_detections_deferred

    anchors = jnp.asarray(anchors_for_shape(BUCKET), jnp.float32)
    ref = detections_from_outputs(
        outputs, BUCKET, pre_nms_top_k=256, use_pallas=False, deferred=True)
    got = batched_detections_deferred(
        outputs["regression"], outputs["classification"], anchors, BUCKET,
        pre_nms_top_k=256, use_pallas=True, pallas_interpret=True)
    _assert_equal(got, ref)


def test_deferred_bf16_logits_match_f32_reference():
    # the bf16 model boundary: logits/deltas on the bf16 grid; the deferred
    # tail upcasts candidates exactly, so results equal the legacy f32 path
    # fed the f32-cast of the same values
    outputs = _outputs(np.random.RandomState(11), 2, 1)
    bf16 = {k: v.astype(jnp.bfloat16) for k, v in outputs.items()}
    asf32 = {k: v.astype(jnp.float32) for k, v in bf16.items()}
    ref = detections_from_outputs(
        asf32, BUCKET, pre_nms_top_k=512, use_pallas=False, deferred=False)
    got = detections_from_outputs(
        bf16, BUCKET, pre_nms_top_k=512, use_pallas=False, deferred=True)
    _assert_equal(got, ref)


def test_deferred_scores_input():
    # classification_is_logits=False: presigmoided scores
    outputs = _outputs(np.random.RandomState(5), 2, 2)
    scores = jnp.asarray(
        1.0 / (1.0 + np.exp(-np.asarray(outputs["classification"]))))
    o = {"regression": outputs["regression"], "classification": scores}
    common = dict(image_shape_hw=BUCKET, classification_is_logits=False,
                  pre_nms_top_k=256, use_pallas=False)
    ref = detections_from_outputs(o, deferred=False, **common)
    got = detections_from_outputs(o, deferred=True, **common)
    _assert_equal(got, ref)


def test_deferred_soft_nms_arm():
    outputs = _outputs(np.random.RandomState(9), 2, 1, spread=2.0, bias=-2.0)
    common = dict(image_shape_hw=BUCKET, pre_nms_top_k=256,
                  soft_nms_sigma=0.5, use_pallas=False)
    ref = detections_from_outputs(outputs, deferred=False, **common)
    got = detections_from_outputs(outputs, deferred=True, **common)
    _assert_equal(got, ref)


def test_deferred_small_candidate_set():
    # n < max_detections: the per-class cap is skipped, outputs are padded
    outputs = _outputs(np.random.RandomState(2), 2, 1, bucket=(32, 32),
                       spread=2.5, bias=-1.0)
    common = dict(image_shape_hw=(32, 32), max_detections=600,
                  pre_nms_top_k=4096, use_pallas=False)
    ref = detections_from_outputs(outputs, deferred=False, **common)
    got = detections_from_outputs(outputs, deferred=True, **common)
    _assert_equal(got, ref)
    assert np.asarray(got.scores).shape[1] == 600


def test_deferred_rejects_unsupported_combo():
    outputs = _outputs(np.random.RandomState(1), 1, 1)
    with pytest.raises(ValueError):
        detections_from_outputs(
            outputs, BUCKET, nms=False, deferred=True, use_pallas=False)
    # auto mode routes unsupported combos to the legacy path
    det = detections_from_outputs(
        outputs, BUCKET, nms=False, use_pallas=False)
    assert np.asarray(det.scores).shape[1] == 300


@pytest.mark.parametrize("classes", [1, 3])
def test_deferred_shared_filter_equals_legacy(classes):
    # class_specific_filter=False: per-anchor max/argmax + one shared NMS
    outputs = _outputs(np.random.RandomState(13), 2, classes)
    common = dict(image_shape_hw=BUCKET, class_specific_filter=False,
                  pre_nms_top_k=256, use_pallas=False)
    ref = detections_from_outputs(outputs, deferred=False, **common)
    got = detections_from_outputs(outputs, deferred=True, **common)
    _assert_equal(got, ref)


def test_deferred_shared_pallas_arm():
    outputs = _outputs(np.random.RandomState(17), 2, 2)
    from tdnet.ops.anchors import anchors_for_shape
    from tdnet.ops.nms import batched_detections_deferred_shared

    anchors = jnp.asarray(anchors_for_shape(BUCKET), jnp.float32)
    ref = detections_from_outputs(
        outputs, BUCKET, class_specific_filter=False, pre_nms_top_k=256,
        use_pallas=False, deferred=True)
    got = batched_detections_deferred_shared(
        outputs["regression"], outputs["classification"], anchors, BUCKET,
        pre_nms_top_k=256, use_pallas=True, pallas_interpret=True)
    _assert_equal(got, ref)


def test_deferred_shared_soft_nms_routes_to_legacy():
    # auto mode keeps (shared + soft-NMS) on the legacy path; forcing
    # deferred raises
    outputs = _outputs(np.random.RandomState(19), 1, 2)
    det = detections_from_outputs(
        outputs, BUCKET, class_specific_filter=False, soft_nms_sigma=0.5,
        pre_nms_top_k=256, use_pallas=False)
    assert np.asarray(det.scores).shape == (1, 300)
    with pytest.raises(ValueError):
        detections_from_outputs(
            outputs, BUCKET, class_specific_filter=False,
            soft_nms_sigma=0.5, pre_nms_top_k=256, use_pallas=False,
            deferred=True)


@pytest.mark.parametrize("class_specific", [True, False])
@pytest.mark.parametrize("thr", [0.0, -1.0, 1.0])
def test_deferred_degenerate_score_thresholds(class_specific, thr):
    """score_threshold <= 0 ("keep everything", the COCO-style eval
    setting) and >= 1 must not crash the logit-space pre-mask
    (regression: math.log(0) ValueError) and must match legacy."""
    outputs = _outputs(np.random.RandomState(23), 2, 2)
    common = dict(image_shape_hw=BUCKET, pre_nms_top_k=256,
                  use_pallas=False, score_threshold=thr,
                  class_specific_filter=class_specific)
    ref = detections_from_outputs(outputs, deferred=False, **common)
    got = detections_from_outputs(outputs, deferred=True, **common)
    _assert_equal(got, ref)
