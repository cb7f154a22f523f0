"""Spatial partitioning (parallel/spatial.py): the 2-D (data, spatial)
mesh graphs must be numerically equivalent to the single-device graphs.

The reference has no spatial parallelism (SURVEY.md §2.4); this is the
TPU-native capability that replaces the previously documented gap. All
tests run on the virtual 8-device CPU mesh (tests/conftest.py) — GSPMD's
halo exchange is backend-agnostic, so CPU equivalence validates the same
partitioned HLO the TPU path compiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.models.retinanet import RetinaNet
from tdnet.parallel.mesh import batch_sharding, replicated_sharding
from tdnet.parallel.spatial import (
    SPATIAL_AXIS,
    activation_sharding,
    batch_shardings,
    create_spatial_mesh,
    image_sharding,
    spatial_size,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device mesh"
)


def _model(**kw):
    return RetinaNet(num_classes=2, dtype=jnp.float32, **kw)


def _images(b, h, w, seed=0):
    return np.random.RandomState(seed).uniform(
        -120, 130, (b, h, w, 3)).astype(np.float32)


def test_mesh_shapes():
    mesh = create_spatial_mesh(4)
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.shape["data"] == 2 and mesh.shape["spatial"] == 4
    assert spatial_size(mesh) == 4
    with pytest.raises(ValueError):
        create_spatial_mesh(3)  # does not divide 8
    s = batch_shardings(("images", "gt_boxes"), mesh)
    assert s["images"] == image_sharding(mesh)
    assert s["gt_boxes"].spec != s["images"].spec


@pytest.mark.parametrize("n_spatial,h,w", [(4, 64, 64), (8, 72, 96)])
def test_forward_equivalence(n_spatial, h, w):
    # 64x64 already exercises uneven partitions at the deep levels (P7 is
    # 1 row over 4 spatial shards); 72x96/8 adds an uneven mid-trunk split
    mesh = create_spatial_mesh(n_spatial)
    b = mesh.shape["data"]
    ref_model = _model()
    sp_model = _model(activation_sharding=activation_sharding(mesh))

    images = _images(b, h, w)
    variables = ref_model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    ref = jax.jit(ref_model.apply)(
        jax.device_put(variables, jax.devices()[0]),
        jax.device_put(images, jax.devices()[0]),
    )

    out = jax.jit(sp_model.apply)(
        jax.device_put(variables, replicated_sharding(mesh)),
        jax.device_put(images, image_sharding(mesh)),
    )
    for k in ("regression", "classification"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), rtol=1e-5, atol=1e-4
        )


def test_detections_equivalence():
    from tdnet.models.detect import detections_from_outputs

    mesh = create_spatial_mesh(4)
    b, h, w = mesh.shape["data"], 64, 64
    ref_model = _model()
    sp_model = _model(activation_sharding=activation_sharding(mesh))
    images = _images(b, h, w, seed=1)
    variables = ref_model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))

    def tail(model):
        def fn(variables, images):
            out = model.apply(variables, images)
            return detections_from_outputs(out, (h, w), use_pallas=False)
        return jax.jit(fn)

    ref = tail(ref_model)(
        jax.device_put(variables, jax.devices()[0]),
        jax.device_put(images, jax.devices()[0]),
    )
    det = tail(sp_model)(
        jax.device_put(variables, replicated_sharding(mesh)),
        jax.device_put(images, image_sharding(mesh)),
    )
    # scores/labels of the kept detections must agree; boxes to fp tolerance
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(det.scores), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(ref.labels), np.asarray(det.labels)
    )
    np.testing.assert_allclose(
        np.asarray(ref.boxes), np.asarray(det.boxes), rtol=1e-5, atol=1e-3
    )


def _train_batch(b, h, w, packed=False, seed=2):
    rng = np.random.RandomState(seed)
    if packed:
        images = rng.randint(0, 256, (b, h, w * 3), np.uint8)
    else:
        images = _images(b, h, w, seed=seed)
    m = 4
    boxes = np.tile(
        np.array([[[8.0, 8.0, 40.0, 32.0], [4.0, 20.0, 30.0, 60.0],
                   [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32), (b, 1, 1))
    return {
        "images": images,
        "gt_boxes": boxes,
        "gt_labels": np.zeros((b, m), np.int32),
        "gt_mask": np.tile(np.arange(m) < 2, (b, 1)),
        "image_hw": np.tile(np.array([h, w], np.float32), (b, 1)),
    }


@pytest.mark.parametrize("packed", [False, True])
def test_train_step_equivalence(packed):
    """One full train step (targets + losses + backward + Adam) under the
    spatial mesh matches the single-device step: loss and updated params.
    packed=True drives the (B, H, W*3) uint8 boundary through the
    shard_map'd Pallas normalize (elementwise — legal on the 2-D mesh;
    train/step.py _ingest_mesh_ok). The fused STEM stays 1-D-mesh-only
    (conv/pool need halos) and falls back to the XLA stem here."""
    from tdnet.train.step import create_train_state, make_train_step

    mesh = create_spatial_mesh(4)
    b, h, w = mesh.shape["data"], 64, 64
    ref_model = _model()
    sp_model = _model(activation_sharding=activation_sharding(mesh))
    batch = _train_batch(b, h, w, packed=packed)

    state = create_train_state(
        ref_model, jax.random.PRNGKey(0), (1, h, w, 3))

    ref_step = make_train_step(ref_model, num_classes=2, fused_stem=False)
    state_ref = jax.device_put(state, jax.devices()[0])
    batch_ref = jax.device_put(batch, jax.devices()[0])
    new_ref, m_ref = ref_step(state_ref, batch_ref)

    sp_step = make_train_step(
        sp_model, num_classes=2, fused_stem=False, mesh=mesh)
    state_sp = jax.device_put(state, replicated_sharding(mesh))
    batch_sp = jax.device_put(batch, batch_shardings(batch, mesh))
    new_sp, m_sp = sp_step(state_sp, batch_sp)

    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_sp["loss"]), rtol=1e-5, atol=1e-6
    )
    assert int(m_ref["num_positive"]) == int(m_sp["num_positive"])
    # params stay replicated and match the single-device update
    kernel = new_sp.params["fpn"]["P3"]["kernel"]
    assert kernel.sharding.is_fully_replicated
    # Param comparison is ABSOLUTE: one Adam step moves each element by at
    # most ~2*lr = 2e-5, and the spatially partitioned conv filter gradient
    # sums shard contributions in a different order, so near-zero gradient
    # elements can flip the sign of their (lr-sized) update — relative
    # tolerance on the params is meaningless at that scale.
    ref_leaves = jax.tree_util.tree_leaves(new_ref.params)
    sp_leaves = jax.tree_util.tree_leaves(new_sp.params)
    for a, c in zip(ref_leaves, sp_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=0, atol=1e-4
        )


def test_packed_uint8_normalize_on_spatial_mesh():
    """normalize_uint8_packed_sharded on the 2-D (data, spatial) mesh:
    per-shard Pallas rows kernel (batch AND H sharded), equal to the
    single-device kernel output; non-dividing H rejected loudly."""
    from tdnet.ops.pallas_ingest import normalize_uint8_packed_sharded

    mesh = create_spatial_mesh(4)
    b, h, w = mesh.shape["data"], 64, 64
    raw = np.random.RandomState(3).randint(0, 256, (b, h, w * 3), np.uint8)

    ref = np.asarray(jax.jit(
        lambda p: normalize_uint8_packed_sharded(p, "caffe")
    )(jax.device_put(raw, jax.devices()[0])))

    packed = jax.device_put(raw, image_sharding(mesh))
    out = jax.jit(
        lambda p: normalize_uint8_packed_sharded(p, "caffe", mesh=mesh)
    )(packed)
    assert out.shape == (b, h, w, 3)
    np.testing.assert_array_equal(ref, np.asarray(out))

    # non-dividing H rejected loudly (unplaced input: device_put with the
    # spatial sharding would itself reject the shape before our check)
    with pytest.raises(ValueError, match="does not divide"):
        normalize_uint8_packed_sharded(
            jnp.asarray(raw[:, :62]), "caffe", mesh=mesh)


def test_spatial_one_degenerates_to_data_mesh():
    """n_spatial=1 keeps the axis (size 1) and behaves like plain DP."""
    mesh = create_spatial_mesh(1)
    assert spatial_size(mesh) == 1
    assert mesh.shape["data"] == 8
    b, h, w = 8, 64, 64
    images = _images(b, h, w)
    sharded = jax.device_put(images, image_sharding(mesh))
    assert sharded.sharding.shard_shape(sharded.shape)[0] == 1
