"""Alternate backbone families: stride/shape contract (reference:
tests/models/test_*.py — build each backbone small, assert output shapes)."""

import jax
import jax.numpy as jnp
import pytest

from tdnet.models.retinanet import RetinaNet, _build_backbone


@pytest.mark.parametrize(
    "name,channels",
    [
        ("vgg16", (256, 512, 512)),
        ("densenet121", (512, 1024, 1024)),
        ("mobilenet", (256, 512, 1024)),
        ("seresnet50", (512, 1024, 2048)),
    ],
)
def test_backbone_strides_and_channels(name, channels):
    module = _build_backbone(name, jnp.float32, True)
    x = jnp.zeros((1, 64, 96, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    c3, c4, c5 = module.apply(variables, x)
    assert c3.shape[:3] == (1, 8, 12)
    assert c4.shape[:3] == (1, 4, 6)
    assert c5.shape[:3] == (1, 2, 3)
    assert (c3.shape[3], c4.shape[3], c5.shape[3]) == channels


def test_retinanet_with_vgg_backbone():
    model = RetinaNet(num_classes=1, backbone_name="vgg16", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    from tdnet.ops.anchors import anchors_for_shape

    assert out["regression"].shape == (1, anchors_for_shape((64, 96)).shape[0], 4)


def test_mobilenet_alpha_name_parsing():
    module = _build_backbone("mobilenet_0.5", jnp.float32, True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    c3, _, c5 = module.apply(variables, x)
    assert c3.shape[-1] == 128  # 256 * 0.5
    assert c5.shape[-1] == 512  # 1024 * 0.5
