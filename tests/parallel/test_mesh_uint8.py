"""Packed-uint8 --device-normalize training under a multi-device mesh.

Regression for a sharding hazard: the single-device packed-uint8 branch
normalizes via a pallas_call (ops/pallas_ingest.py), which is an opaque
custom call to the GSPMD partitioner — under a mesh it would force the
batch-sharded global batch to be gathered/replicated. make_train_step must
route multi-device runs through the plain-jnp normalize instead (same
math), keeping the graph fully partitionable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.models.retinanet import RetinaNet
from tdnet.parallel.mesh import (batch_sharding, create_mesh,
                                 replicated_sharding)
from tdnet.train.step import create_train_state, make_train_step


def _batch(b, h, w):
    r = np.random.RandomState(0)
    return {
        "gt_boxes": np.tile(
            np.array([[[8.0, 8.0, 40.0, 32.0]]], np.float32), (b, 1, 1)),
        "gt_labels": np.zeros((b, 1), np.int32),
        "gt_mask": np.ones((b, 1), bool),
        "image_hw": np.tile(np.array([float(h), float(w)], np.float32),
                            (b, 1)),
    }, r.randint(0, 256, (b, h, w, 3)).astype(np.uint8)


def test_packed_uint8_train_step_on_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(jax.devices()[:8])
    b, h, w = 8, 64, 96

    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, h, w, 3))
    state = jax.device_put(state, replicated_sharding(mesh))

    base, raw = _batch(b, h, w)
    step = make_train_step(model, num_classes=1)

    # packed (B, H, W*3) uint8 arm — must compile + run fully sharded
    packed = dict(base, images=raw.reshape(b, h, w * 3))
    bp = jax.device_put(packed, batch_sharding(mesh))
    _, m_u8 = jax.block_until_ready(step(state, bp))

    # f32 prenormalized arm (same math as the in-graph jnp normalize)
    from tdnet.data.image import CAFFE_MEAN_BGR

    f32 = dict(base, images=(raw.astype(np.float32)
                             - np.asarray(CAFFE_MEAN_BGR, np.float32)))
    bf = jax.device_put(f32, batch_sharding(mesh))
    _, m_f32 = jax.block_until_ready(step(state, bf))

    l_u8 = float(jax.device_get(m_u8["loss"]))
    l_f32 = float(jax.device_get(m_f32["loss"]))
    assert np.isfinite(l_u8)
    np.testing.assert_allclose(l_u8, l_f32, rtol=1e-6)
