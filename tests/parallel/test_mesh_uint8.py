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


def test_packed_uint8_mesh_shard_map_pallas_normalize():
    """make_train_step(mesh=...) routes the packed-uint8 normalize through
    the Pallas rows kernel under shard_map (one per-device invocation on
    the local shard) — and matches the meshless jnp-normalize step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(jax.devices()[:8])
    b, h, w = 8, 64, 96

    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, h, w, 3))
    state = jax.device_put(state, replicated_sharding(mesh))

    base, raw = _batch(b, h, w)
    packed = dict(base, images=raw.reshape(b, h, w * 3))
    bp = jax.device_put(packed, batch_sharding(mesh))

    step_jnp = make_train_step(model, num_classes=1)
    step_mesh = make_train_step(model, num_classes=1, mesh=mesh)
    _, m_jnp = jax.block_until_ready(step_jnp(state, bp))
    _, m_mesh = jax.block_until_ready(step_mesh(state, bp))
    np.testing.assert_allclose(
        float(jax.device_get(m_mesh["loss"])),
        float(jax.device_get(m_jnp["loss"])), rtol=1e-6)


@pytest.mark.parametrize("backward", ["remat", "kernel"])
def test_fused_stem_train_on_mesh(backward, monkeypatch):
    """The fused ingest+stem custom-VJP op under an 8-device mesh
    (shard_map forward + psum'd parameter gradients, both backward modes)
    matches the non-fused mesh step's loss."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setenv("TDNET_STEM_BWD", backward)
    mesh = create_mesh(jax.devices()[:8])
    b, h, w = 8, 64, 96

    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, h, w, 3))
    state = jax.device_put(state, replicated_sharding(mesh))

    base, raw = _batch(b, h, w)
    packed = dict(base, images=raw.reshape(b, h, w * 3))
    bp = jax.device_put(packed, batch_sharding(mesh))

    step_plain = make_train_step(model, num_classes=1, mesh=mesh,
                                 fused_stem=False)
    step_fused = make_train_step(model, num_classes=1, mesh=mesh,
                                 fused_stem=True)
    st_p, m_p = jax.block_until_ready(step_plain(state, bp))
    st_f, m_f = jax.block_until_ready(step_fused(state, bp))
    np.testing.assert_allclose(
        float(jax.device_get(m_f["loss"])),
        float(jax.device_get(m_p["loss"])), rtol=1e-4)
    # parameter gradients psum over the axis: updated params replicated +
    # close to the non-fused step's
    k_f = st_f.params["backbone"]["conv1"]["kernel"]
    assert k_f.sharding.is_fully_replicated
    # atol: first-step Adam updates are sign(g)*lr-like (lr 1e-5), so a
    # float-noise sign flip on a near-zero gradient moves a weight 2e-5
    np.testing.assert_allclose(
        np.asarray(jax.device_get(k_f)),
        np.asarray(jax.device_get(st_p.params["backbone"]["conv1"]["kernel"])),
        rtol=5e-3, atol=3e-5)
