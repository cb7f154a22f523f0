"""Initial-weight loading (reference: bin/train.py create_models
--weights/--imagenet-weights) and the BN-statistics warm-up."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.models.retinanet import RetinaNet
from tdnet.train.weights import bn_warmup, find_imagenet_weights, load_initial_weights


@pytest.fixture(scope="module")
def small_model_vars():
    model = RetinaNet(num_classes=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }


def _leaf(tree, *path):
    node = tree
    for k in path:
        node = node[k]
    return np.asarray(node)


def test_load_tdn_weights(tmp_path, small_model_vars):
    from tdnet.models.io import save_model

    model, variables = small_model_vars
    # perturb a copy and save it, then load into a fresh template
    perturbed = jax.tree_util.tree_map(lambda x: x + 0.5, variables["params"])
    path = str(tmp_path / "w.tdn")
    save_model(path, model, {"params": perturbed,
                             "batch_stats": variables["batch_stats"]})

    loaded = load_initial_weights(path, variables, verbose=False)
    got = _leaf(loaded["params"], "fpn", "P3", "kernel")
    want = _leaf(perturbed, "fpn", "P3", "kernel")
    np.testing.assert_allclose(got, want)


def test_load_tdn_skips_mismatched_heads(tmp_path, small_model_vars):
    """A .tdn trained with a different num_classes loads the backbone/FPN and
    skips the classification head (Keras skip_mismatch semantics)."""
    from tdnet.models.io import save_model

    model, variables = small_model_vars
    other = RetinaNet(num_classes=5, dtype=jnp.float32)
    other_vars = other.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    path = str(tmp_path / "other.tdn")
    save_model(path, other, {"params": other_vars["params"],
                             "batch_stats": other_vars.get("batch_stats", {})})

    loaded = load_initial_weights(path, variables, verbose=False)
    # backbone conv got the donor's values
    np.testing.assert_allclose(
        _leaf(loaded["params"], "backbone", "conv1", "kernel"),
        _leaf(other_vars["params"], "backbone", "conv1", "kernel"),
    )
    # classification head kept the template's shape/values
    got_head = _leaf(loaded["params"], "classification_submodel", "head", "kernel")
    want_head = _leaf(variables["params"], "classification_submodel", "head", "kernel")
    np.testing.assert_allclose(got_head, want_head)


def test_load_keras_h5_into_training(tmp_path, small_model_vars):
    """Keras h5 -> load_initial_weights -> params actually change (the
    importer is wired into training, not just a test fixture)."""
    h5py = pytest.importorskip("h5py")  # noqa: F841
    from tdnet.compat.keras_import import export_random_keras_weights

    model, variables = small_model_vars
    perturbed = {
        "params": jax.tree_util.tree_map(lambda x: x * 1.25 + 0.125,
                                         variables["params"]),
        "batch_stats": variables["batch_stats"],
    }
    path = str(tmp_path / "keras.h5")
    export_random_keras_weights(path, perturbed)

    loaded = load_initial_weights(path, variables, verbose=False)
    got = _leaf(loaded["params"], "backbone", "conv1", "kernel")
    want = _leaf(perturbed["params"], "backbone", "conv1", "kernel")
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # and step-0 forward output differs from the random-init template
    x = jnp.ones((1, 64, 64, 3))
    out_init = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}, x
    )
    out_loaded = model.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]}, x
    )
    assert not np.allclose(
        np.asarray(out_init["classification"]),
        np.asarray(out_loaded["classification"]),
    )


def test_bn_warmup_estimates_input_moments(small_model_vars):
    """After warm-up, the stem BN's stored stats match the actual moments of
    its input (conv1 output) instead of the (0, 1) init."""
    model, variables = small_model_vars
    rng = np.random.RandomState(0)
    batches = [
        {"images": rng.uniform(-80, 80, (2, 64, 64, 3)).astype(np.float32)}
        for _ in range(4)
    ]

    warmed = bn_warmup(model, variables, iter(batches), num_batches=4,
                       verbose=False)
    new_mean = _leaf(warmed["batch_stats"], "backbone", "bn1", "mean")
    new_var = _leaf(warmed["batch_stats"], "backbone", "bn1", "var")
    assert not np.allclose(new_mean, 0.0)
    assert not np.allclose(new_var, 1.0)
    assert np.all(np.isfinite(new_mean)) and np.all(new_var > 0)

    # cross-check the stem BN against a direct computation of conv1 moments
    kernel = jnp.asarray(_leaf(variables["params"], "backbone", "conv1", "kernel"))
    import jax.lax as lax

    means, sqs = [], []
    for b in batches:
        x = jnp.asarray(b["images"])
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        y = lax.conv_general_dilated(
            x, kernel, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        means.append(np.mean(np.asarray(y), axis=(0, 1, 2)))
        sqs.append(np.mean(np.square(np.asarray(y)), axis=(0, 1, 2)))
    want_mean = np.mean(means, axis=0)
    want_var = np.mean(sqs, axis=0) - want_mean**2
    np.testing.assert_allclose(new_mean, want_mean, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(new_var, want_var, rtol=1e-2, atol=1e-2)


def test_find_imagenet_weights_missing(monkeypatch, tmp_path):
    from tdnet.train import weights as W

    monkeypatch.setattr(W, "IMAGENET_SEARCH_DIRS", [str(tmp_path)])
    assert find_imagenet_weights("resnet50") is None
    with pytest.raises(FileNotFoundError, match="bn-warmup"):
        W.imagenet_weights_or_explain("resnet50")
    # and a present file is found
    target = tmp_path / "ResNet-50-model.keras.h5"
    target.write_bytes(b"")
    assert W.find_imagenet_weights("resnet50") == str(target)
