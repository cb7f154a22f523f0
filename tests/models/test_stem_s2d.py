"""Space-to-depth stem (models/resnet.py StemConv): the TPU-fast
reformulation must be numerically equivalent to the canonical pad-3 7x7/2
conv, with the parameter stored in the canonical (7,7,C,F) layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.models.resnet import StemConv


@pytest.fixture(scope="module")
def stem_and_input():
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-120, 120, (2, 64, 96, 3)), jnp.float32
    )
    plain = StemConv(s2d=False)
    variables = plain.init(jax.random.PRNGKey(0), x)
    return plain, variables, x


def test_s2d_matches_plain(stem_and_input):
    plain, variables, x = stem_and_input
    y_plain = plain.apply(variables, x)
    y_s2d = StemConv(s2d=True).apply(variables, x)
    assert y_plain.shape == y_s2d.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_plain), atol=5e-4, rtol=1e-5
    )


def test_odd_shapes_fall_back_exactly(stem_and_input):
    plain, variables, x = stem_and_input
    x_odd = x[:, :63, :95, :]
    y_plain = plain.apply(variables, x_odd)
    y_s2d = StemConv(s2d=True).apply(variables, x_odd)
    np.testing.assert_array_equal(np.asarray(y_s2d), np.asarray(y_plain))


def test_param_layout_is_canonical(stem_and_input):
    _, variables, _ = stem_and_input
    assert variables["params"]["kernel"].shape == (7, 7, 3, 64)


def test_s2d_under_jit_and_grad(stem_and_input):
    plain, variables, x = stem_and_input

    @jax.jit
    def loss(params, x):
        return jnp.sum(StemConv(s2d=True).apply(params, x) ** 2)

    g_s2d = jax.grad(loss)(variables, x)["params"]["kernel"]

    @jax.jit
    def loss_plain(params, x):
        return jnp.sum(StemConv(s2d=False).apply(params, x) ** 2)

    g_plain = jax.grad(loss_plain)(variables, x)["params"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(g_s2d), np.asarray(g_plain), rtol=1e-3, atol=1e-2
    )
