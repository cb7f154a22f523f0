"""Tensor parallelism (parallel/tensor.py): C_out-sharded graphs must be
numerically equivalent to the single-device graphs, and the sharding must
actually stick through a train step (params AND Adam moments stay
partitioned — that is the memory the mode exists to divide).

The reference has no model parallelism (SURVEY.md §2.4). All tests run on
the virtual 8-device CPU mesh (tests/conftest.py) — GSPMD's channel
partitioning is backend-agnostic, so CPU equivalence validates the same
partitioned HLO the TPU path compiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tdnet.models.retinanet import RetinaNet
from tdnet.parallel.mesh import batch_sharding
from tdnet.parallel.tensor import (
    MODEL_AXIS,
    create_tensor_mesh,
    model_size,
    param_partition_spec,
    shard_state,
    state_shardings,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device mesh"
)


def _model():
    return RetinaNet(num_classes=2, dtype=jnp.float32)


def test_mesh_shapes():
    mesh = create_tensor_mesh(4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4
    assert model_size(mesh) == 4
    with pytest.raises(ValueError):
        create_tensor_mesh(3)  # does not divide 8


def test_partition_spec_rule():
    mesh = create_tensor_mesh(4)
    variables = _model().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    specs = state_shardings(variables["params"], mesh)
    # tower/FPN kernels (C_out=256): sharded on the last dim
    assert specs["fpn"]["P3"]["kernel"].spec == P(None, None, None, MODEL_AXIS)
    assert (specs["classification_submodel"]["conv0"]["kernel"].spec
            == P(None, None, None, MODEL_AXIS))
    # task heads (C_out = 9*2 / 9*4 < MIN_SHARDED_CHANNELS): replicated
    assert specs["classification_submodel"]["head"]["kernel"].spec == P()
    assert specs["regression_submodel"]["head"]["kernel"].spec == P()
    # biases / BN params: replicated
    assert specs["fpn"]["P3"]["bias"].spec == P()
    # the rule keys on the tree path, not the module: a bare leaf
    assert param_partition_spec((), np.zeros((3, 3, 4, 256)), 4) == P()


def _train_batch(b, h, w, seed=2):
    rng = np.random.RandomState(seed)
    m = 4
    boxes = np.tile(
        np.array([[[8.0, 8.0, 40.0, 32.0], [4.0, 20.0, 30.0, 60.0],
                   [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32), (b, 1, 1))
    return {
        "images": rng.uniform(-120, 130, (b, h, w, 3)).astype(np.float32),
        "gt_boxes": boxes,
        "gt_labels": np.zeros((b, m), np.int32),
        "gt_mask": np.tile(np.arange(m) < 2, (b, 1)),
        "image_hw": np.tile(np.array([h, w], np.float32), (b, 1)),
    }


@pytest.mark.parametrize("n_model", [4, 8])
def test_train_step_equivalence(n_model):
    """One full train step (targets + losses + backward + Adam) with
    C_out-sharded kernels matches the single-device step, and the updated
    params/moments keep their 'model' sharding (no silent all-gather)."""
    from tdnet.train.step import create_train_state, make_train_step

    mesh = create_tensor_mesh(n_model)
    b, h, w = 2 * mesh.shape["data"], 64, 64
    model = _model()
    batch = _train_batch(b, h, w)

    state = create_train_state(model, jax.random.PRNGKey(0), (1, h, w, 3))

    ref_step = make_train_step(model, num_classes=2, fused_stem=False)
    new_ref, m_ref = ref_step(
        jax.device_put(state, jax.devices()[0]),
        jax.device_put(batch, jax.devices()[0]),
    )

    tp_step = make_train_step(
        model, num_classes=2, fused_stem=False, mesh=mesh)
    state_tp = shard_state(state, mesh)
    # placement did shard: each device holds C_out/n_model of the kernel
    k = state_tp.params["fpn"]["P3"]["kernel"]
    assert k.sharding.shard_shape(k.shape)[-1] == 256 // n_model
    batch_tp = jax.device_put(batch, batch_sharding(mesh))
    new_tp, m_tp = tp_step(state_tp, batch_tp)

    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_tp["loss"]), rtol=1e-5, atol=1e-6)
    assert int(m_ref["num_positive"]) == int(m_tp["num_positive"])

    # sharding survived the update — params AND Adam moments
    k_new = new_tp.params["fpn"]["P3"]["kernel"]
    assert not k_new.sharding.is_fully_replicated
    assert k_new.sharding.shard_shape(k_new.shape)[-1] == 256 // n_model
    sharded_moments = [
        x for x in jax.tree_util.tree_leaves(new_tp.opt_state)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert sharded_moments, "Adam moments stayed fully replicated"

    # numeric equivalence of the update (absolute tolerance: one Adam step
    # moves each element by at most ~2*lr; see test_spatial.py rationale)
    for a, c in zip(jax.tree_util.tree_leaves(new_ref.params),
                    jax.tree_util.tree_leaves(new_tp.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=0, atol=1e-4)


def test_forward_equivalence():
    mesh = create_tensor_mesh(8)
    b, h, w = 8, 64, 64
    model = _model()
    images = np.random.RandomState(0).uniform(
        -120, 130, (b, h, w, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))

    ref = jax.jit(model.apply)(
        jax.device_put(variables, jax.devices()[0]),
        jax.device_put(images, jax.devices()[0]),
    )
    out = jax.jit(model.apply)(
        shard_state(variables, mesh),
        jax.device_put(images, batch_sharding(mesh)),
    )
    for key in ("regression", "classification"):
        np.testing.assert_allclose(
            np.asarray(ref[key]), np.asarray(out[key]), rtol=1e-5, atol=1e-4)


def test_tensor_one_degenerates_to_data_mesh():
    mesh = create_tensor_mesh(1)
    assert model_size(mesh) == 1
    assert mesh.shape["data"] == 8
    variables = _model().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    placed = shard_state(variables, mesh)
    # a size-1 model axis shards nothing: everything fully replicated
    assert placed["params"]["fpn"]["P3"][
        "kernel"].sharding.is_fully_replicated
