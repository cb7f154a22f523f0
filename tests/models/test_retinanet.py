"""Model tests (reference: tests/models/test_*.py style — small inputs,
shape and init assertions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.models import backbone
from tdnet.models.detect import detections_from_outputs
from tdnet.models.layers import resize_nearest_like
from tdnet.models.retinanet import RetinaNet
from tdnet.ops.anchors import anchors_for_shape


@pytest.fixture(scope="module")
def small_model_and_vars():
    model = RetinaNet(num_classes=2, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_output_shapes_match_anchor_count(small_model_and_vars):
    model, variables, x = small_model_and_vars
    out = model.apply(variables, x)
    n = anchors_for_shape((64, 96)).shape[0]
    assert out["regression"].shape == (1, n, 4)
    assert out["classification"].shape == (1, n, 2)


def test_prior_probability_bias(small_model_and_vars):
    _, variables, _ = small_model_and_vars
    bias = variables["params"]["classification_submodel"]["head"]["bias"]
    want = -np.log((1 - 0.01) / 0.01)
    np.testing.assert_allclose(np.asarray(bias), want, rtol=1e-6)
    # cold-start classification scores ~ 0.01 everywhere
    model, v, x = small_model_and_vars
    out = model.apply(v, x)
    probs = jax.nn.sigmoid(out["classification"])
    assert 0.005 < float(probs.mean()) < 0.02


def test_subnet_weights_shared_across_levels(small_model_and_vars):
    _, variables, _ = small_model_and_vars
    # exactly ONE set of subnet params (not one per pyramid level)
    cls_params = variables["params"]["classification_submodel"]
    assert set(cls_params.keys()) == {"conv0", "conv1", "conv2", "conv3", "head"}


def test_backbone_feature_strides(small_model_and_vars):
    from tdnet.models.resnet import ResNet

    net = ResNet(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    c3, c4, c5 = net.apply(variables, x)
    assert c3.shape == (1, 8, 12, 512)
    assert c4.shape == (1, 4, 6, 1024)
    assert c5.shape == (1, 2, 3, 2048)


def test_resize_nearest_tf1_semantics():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = np.asarray(resize_nearest_like(x, (4, 4)))[0, :, :, 0]
    want = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])
    np.testing.assert_array_equal(y, want)
    # odd target: src = floor(i * 2 / 5) -> rows 0,0,0,1,1
    y5 = np.asarray(resize_nearest_like(x, (5, 5)))[0, :, 0, 0]
    np.testing.assert_array_equal(y5, [0, 0, 0, 2, 2])


def test_unknown_backbone_raises():
    with pytest.raises(ValueError, match="unknown backbone"):
        backbone("resnext999")
    with pytest.raises(ValueError, match="unknown backbone"):
        model = RetinaNet(num_classes=1, backbone_name="nope")
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_bfloat16_forward(small_model_and_vars):
    model = RetinaNet(num_classes=2, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # outputs promoted to fp32 for the loss/decode path
    assert out["regression"].dtype == jnp.float32
    assert jnp.isfinite(out["classification"]).all()


def test_end_to_end_detections(small_model_and_vars):
    model, variables, x = small_model_and_vars
    out = model.apply(variables, x)
    det = detections_from_outputs(out, (64, 96), max_detections=7, pre_nms_top_k=64)
    assert det.boxes.shape == (1, 7, 4)
    assert det.scores.shape == (1, 7)
    # cold-start scores ~0.01 are all below the 0.05 threshold -> all padded
    assert (np.asarray(det.scores) == -1).all()


def test_output_dtype_none_keeps_native_boundary(small_model_and_vars):
    # output_dtype=None: the heads' compute dtype crosses the boundary and
    # the values are exactly the pre-cast ones (the f32 default is a cast)
    _, variables, x = small_model_and_vars
    bf = RetinaNet(num_classes=2, dtype=jnp.bfloat16, output_dtype=None)
    f32b = RetinaNet(num_classes=2, dtype=jnp.bfloat16)  # default boundary
    out_bf = bf.apply(variables, x)
    out_f32 = f32b.apply(variables, x)
    assert out_bf["classification"].dtype == jnp.bfloat16
    assert out_f32["classification"].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out_bf["regression"].astype(jnp.float32)),
        np.asarray(out_f32["regression"]),
    )
    np.testing.assert_array_equal(
        np.asarray(out_bf["classification"].astype(jnp.float32)),
        np.asarray(out_f32["classification"]),
    )
