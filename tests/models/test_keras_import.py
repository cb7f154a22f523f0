"""Round-trip parity: export tdnet weights to Keras-layout h5, reload, and
confirm identical forward outputs — the offline form of the "same weights"
requirement (SURVEY.md §8)."""

import jax
import jax.numpy as jnp
import numpy as np

from tdnet.compat.keras_import import (
    export_random_keras_weights,
    keras_name_map,
    load_keras_retinanet_h5,
)
from tdnet.models.retinanet import RetinaNet


def test_name_map_covers_resnet50():
    m = keras_name_map((3, 4, 6, 3))
    assert m["conv1"] == ("backbone", "conv1")
    assert m["res2a_branch2a"] == ("backbone", "stage2_block0", "conv1")
    assert m["bn5c_branch2c"] == ("backbone", "stage5_block2", "bn3")
    assert m["res3a_branch1"] == ("backbone", "stage3_block0", "conv_shortcut")
    assert "res3b_branch1" not in m  # projection only on each stage's block 0
    assert m["pyramid_classification"] == ("classification_submodel", "head")
    # stem conv+bn + per-block 3 conv+3 bn + per-stage proj conv+bn + fpn 8 + heads 10
    assert len(m) == 2 + (3 + 4 + 6 + 3) * 6 + 4 * 2 + 8 + 10


def test_h5_round_trip_identical_outputs(tmp_path):
    model = RetinaNet(num_classes=1, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-100, 100, (1, 64, 96, 3)), jnp.float32
    )
    v1 = model.init(jax.random.PRNGKey(1), x)
    v2 = model.init(jax.random.PRNGKey(2), x)  # different weights

    out1 = model.apply(v1, x)
    out2 = model.apply(v2, x)
    assert np.abs(np.asarray(out1["regression"]) - np.asarray(out2["regression"])).max() > 0

    # export v1 in Keras layout, import into v2's tree -> outputs must match v1
    h5 = str(tmp_path / "weights.h5")
    export_random_keras_weights(h5, v1)
    imported = load_keras_retinanet_h5(h5, v2, strict=True)
    out3 = model.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]}, x
    )
    np.testing.assert_allclose(
        np.asarray(out3["regression"]), np.asarray(out1["regression"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out3["classification"]),
        np.asarray(out1["classification"]),
        atol=1e-6,
    )


import pytest


@pytest.mark.parametrize("backbone_name", ["vgg16", "densenet121", "mobilenet"])
def test_h5_round_trip_other_backbones(tmp_path, backbone_name):
    """keras_name_map_for covers every backbone family (reference:
    models/__init__.py load_model works for all backbones)."""
    from tdnet.compat.keras_import import keras_name_map_for

    model = RetinaNet(num_classes=1, backbone_name=backbone_name,
                      dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-100, 100, (1, 64, 96, 3)), jnp.float32
    )
    v1 = model.init(jax.random.PRNGKey(1), x)
    v2 = model.init(jax.random.PRNGKey(2), x)
    out1 = model.apply(v1, x)

    name_map = keras_name_map_for(backbone_name)
    h5 = str(tmp_path / f"{backbone_name}.h5")
    export_random_keras_weights(h5, v1, name_map=name_map)
    imported = load_keras_retinanet_h5(h5, v2, name_map=name_map, strict=True)
    out3 = model.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]}, x
    )
    np.testing.assert_allclose(
        np.asarray(out3["regression"]), np.asarray(out1["regression"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out3["classification"]),
        np.asarray(out1["classification"]),
        atol=1e-5,
    )


def test_name_map_densenet_slashed_stem(tmp_path):
    """The densenet stem accepts the keras-applications-1.0 slashed layer
    names ('conv1/conv') whose h5 paths nest one level deeper."""
    from tdnet.compat.keras_import import keras_name_map_densenet

    m = keras_name_map_densenet((6, 12, 24, 16))
    assert m["conv1/conv"] == ("backbone", "conv1")
    assert m["conv1_conv"] == ("backbone", "conv1")
    assert m["conv2_block1_1_conv"] == ("backbone", "block2_layer0", "conv1")
    assert m["pool3_conv"] == ("backbone", "transition3_conv")
