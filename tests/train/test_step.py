"""Train-step tests: loss decreases on a tiny overfit task; sharded
multi-device execution on the virtual 8-CPU mesh (no reference analog —
SURVEY.md §5 carry-over adds this)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.models.retinanet import RetinaNet
from tdnet.parallel.mesh import batch_sharding, create_mesh, replicated_sharding
from tdnet.train.step import (
    clip_by_leaf_norm,
    create_optimizer,
    create_train_state,
    make_train_step,
)


def _tiny_batch(b=1, h=64, w=96):
    rng = np.random.RandomState(0)
    images = rng.uniform(-100, 100, (b, h, w, 3)).astype(np.float32)
    gt_boxes = np.tile(np.array([[10.0, 10.0, 50.0, 40.0]], np.float32), (b, 4, 1))
    gt_labels = np.zeros((b, 4), np.int32)
    gt_mask = np.zeros((b, 4), bool)
    gt_mask[:, 0] = True
    return {
        "images": images,
        "gt_boxes": gt_boxes,
        "gt_labels": gt_labels,
        "gt_mask": gt_mask,
        "image_hw": np.tile(np.array([h, w], np.float32), (b, 1)),
    }


def test_clip_by_leaf_norm():
    tx = clip_by_leaf_norm(1.0)
    grads = {"a": jnp.full((4,), 10.0), "b": jnp.full((2,), 0.1)}
    out, _ = tx.update(grads, tx.init(grads))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["a"])), 1.0, rtol=1e-5
    )  # clipped
    np.testing.assert_allclose(np.asarray(out["b"]), 0.1, rtol=1e-5)  # untouched


@pytest.fixture(scope="module")
def trained_bits():
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 96, 3),
        tx=create_optimizer(learning_rate=3e-4, clipnorm=1e6),
    )
    step = make_train_step(model, num_classes=1)
    return model, state, step


def test_loss_decreases(trained_bits):
    _, state, step = trained_bits
    batch = _tiny_batch()
    state, m0 = step(state, batch)
    first = float(m0["loss"])
    losses = []
    for _ in range(20):  # ride out the early Adam transient
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(metrics["num_positive"]) > 0
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < first
    # divergence-observability metric: pre-clip global grad norm is
    # reported every step (round-3 epoch-217 finding's product guard)
    assert float(metrics["grad_norm"]) > 0.0
    assert np.isfinite(float(metrics["grad_norm"]))


def test_freeze_backbone_masks_updates():
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 96, 3),
        tx=create_optimizer(learning_rate=1e-2, clipnorm=1e6),
        freeze_backbone=True,
    )
    step = make_train_step(model, num_classes=1)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state, _ = step(state, _tiny_batch())
    after = state.params
    # backbone untouched
    b0 = before["backbone"]["conv1"]["kernel"]
    b1 = np.asarray(after["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(b0, b1)
    # heads moved
    h0 = before["classification_submodel"]["head"]["kernel"]
    h1 = np.asarray(after["classification_submodel"]["head"]["kernel"])
    assert np.abs(h1 - h0).max() > 0


def test_train_step_on_8_device_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    mesh = create_mesh()
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 96, 3))
    step = make_train_step(model, num_classes=1)

    state = jax.device_put(state, replicated_sharding(mesh))
    batch = jax.device_put(_tiny_batch(b=8), batch_sharding(mesh))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the update
    kernel = new_state.params["fpn"]["P3"]["kernel"]
    assert kernel.sharding.is_fully_replicated


def test_train_step_packed_uint8_matches_float():
    """The packed (B, H, W*3) uint8 train path (data/prefetch.py packing +
    the Pallas rows-normalize in the step) must produce the same loss and
    gradients-effect as the float path on integer-valued images."""
    import numpy as np

    from tdnet.data.image import CAFFE_MEAN_BGR
    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.step import (create_optimizer, create_train_state,
                                  make_train_step)

    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 96, 3),
        tx=create_optimizer(1e-3, 100.0),
    )
    step = make_train_step(model, 1)

    r = np.random.RandomState(2)
    raw = r.randint(0, 256, (2, 64, 96, 3)).astype(np.uint8)
    gt_boxes = jnp.asarray([[[10.0, 10.0, 50.0, 40.0]]] * 2)
    gt_labels = jnp.zeros((2, 1), jnp.int32)
    gt_mask = jnp.ones((2, 1), bool)
    hw = jnp.asarray([[64, 96]] * 2, jnp.int32)

    common = dict(gt_boxes=gt_boxes, gt_labels=gt_labels,
                  gt_mask=gt_mask, image_hw=hw)
    batch_f = dict(images=jnp.asarray(
        raw.astype(np.float32) - np.asarray(CAFFE_MEAN_BGR, np.float32)),
        **common)
    batch_u8 = dict(images=jnp.asarray(raw.reshape(2, 64, 96 * 3)), **common)

    _, m_f = step(state, batch_f)
    _, m_u8 = step(state, batch_u8)
    assert float(m_u8["loss"]) == pytest.approx(float(m_f["loss"]), rel=1e-5)
    assert float(m_u8["num_positive"]) == float(m_f["num_positive"])


def test_prefetch_packs_uint8_batches():
    from tdnet.data.prefetch import _pack_uint8_images
    import numpy as np

    b = {"images": np.zeros((2, 8, 12, 3), np.uint8), "x": 1}
    out = _pack_uint8_images(b)
    assert out["images"].shape == (2, 8, 36) and out["x"] == 1
    # float batches pass through untouched
    bf = {"images": np.zeros((2, 8, 12, 3), np.float32)}
    assert _pack_uint8_images(bf)["images"].shape == (2, 8, 12, 3)


def test_fused_stem_falls_through_on_unsupported_shape():
    # H % 8 != 0 is outside the fused-stem kernel's support; the fused
    # branch must FALL THROUGH to Pallas-normalize + XLA stem instead of
    # raising at trace time (regression: the old branch condition only
    # checked dtype/ndim)
    import optax

    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.step import create_train_state, make_train_step

    b, h, w = 2, 36, 64
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, h, w, 3), tx=optax.sgd(1e-2))
    raw = np.random.RandomState(1).randint(0, 256, (b, h, w, 3), np.uint8)
    batch = {
        "images": raw.reshape(b, h, w * 3),
        "gt_boxes": np.tile(np.array([[4.0, 4.0, 30.0, 24.0]], np.float32),
                            (b, 2, 1)),
        "gt_labels": np.zeros((b, 2), np.int32),
        "gt_mask": np.tile(np.array([True, False]), (b, 1)),
        "image_hw": np.tile(np.array([h, w], np.float32), (b, 1)),
    }
    step = make_train_step(model, num_classes=1, fused_stem=True)
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
