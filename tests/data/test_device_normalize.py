"""Fused device-side normalization path: uint8 batches + in-graph mean-sub
must match the host-normalized path up to uint8 rounding."""

import numpy as np
import pytest

from tdnet.data.generator import BatchLoader, LoaderConfig
from tdnet.data.image import CAFFE_MEAN_BGR, preprocess_image_device


class OnePage:
    def size(self):
        return 1

    def num_classes(self):
        return 1

    def image_aspect_ratio(self, i):
        return 2.0

    def load_image(self, i):
        rng = np.random.RandomState(0)
        return rng.uniform(0, 255, (100, 200, 3)).astype(np.float32)

    def load_annotations(self, i):
        return {
            "labels": np.zeros((1,), np.int64),
            "bboxes": np.array([[50.0, 25.0, 100.0, 50.0]]),
        }


def _batch(device_normalize):
    cfg = LoaderConfig(
        batch_size=1, min_side=64, max_side=128, buckets=[(64, 128)],
        shuffle=False, device_normalize=device_normalize,
    )
    return next(iter(BatchLoader(OnePage(), cfg)))


def test_uint8_batch_and_parity():
    host = _batch(False)
    dev = _batch(True)
    assert dev["images"].dtype == np.uint8
    assert host["images"].dtype == np.float32

    normalized = np.asarray(preprocess_image_device(dev["images"], "caffe"))
    # parity within uint8 rounding (+ interp of normalized vs raw: commutes)
    assert np.abs(normalized - host["images"]).max() <= 1.0
    np.testing.assert_allclose(dev["gt_boxes"], host["gt_boxes"], rtol=1e-6)


def test_preprocess_device_modes():
    x = np.full((1, 2, 2, 3), 255, np.uint8)
    caffe = np.asarray(preprocess_image_device(x, "caffe"))
    np.testing.assert_allclose(caffe[0, 0, 0], 255.0 - CAFFE_MEAN_BGR, rtol=1e-6)
    tf = np.asarray(preprocess_image_device(x, "tf"))
    np.testing.assert_allclose(tf, 1.0, rtol=1e-6)
    with pytest.raises(ValueError):
        preprocess_image_device(x, "nope")


def test_train_step_accepts_uint8():
    import jax
    import jax.numpy as jnp

    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.step import create_train_state, make_train_step

    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    step = make_train_step(model, num_classes=1)
    batch = _batch(True)
    batch = {k: v for k, v in batch.items() if k != "scale" and k != "indices"}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
