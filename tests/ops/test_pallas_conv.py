"""Fused conv1x1 (+BN affine, +residual, +ReLU) Pallas kernel vs the
unfused XLA composition — interpret mode on CPU, same contract as on TPU."""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.ops.pallas_conv import fused_conv1x1

DN = ("NHWC", "HWIO", "NHWC")


def _ref(x, w, inv, off, res=None, relu=True):
    y = lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=DN)
    y = y * inv + off
    if res is not None:
        y = y + res
    if relu:
        y = jnp.maximum(y, 0)
    return y


@pytest.mark.parametrize("relu,with_res", [
    (True, True), (True, False), (False, False), (False, True),
])
def test_matches_unfused(relu, with_res):
    rng = np.random.RandomState(0)
    b, h, w_, k, n = 2, 9, 17, 64, 96
    x = jnp.asarray(rng.randn(b, h, w_, k), jnp.float32)
    kern = jnp.asarray(rng.randn(1, 1, k, n) * 0.1, jnp.float32)
    inv = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(n) * 0.1, jnp.float32)
    res = jnp.asarray(rng.randn(b, h, w_, n), jnp.float32) if with_res else None

    want = _ref(x, kern, inv, off, res, relu)
    got = fused_conv1x1(x, kern, inv, off, residual=res, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_nonaligned_shapes_padded_correctly():
    """M and N not multiples of the tiles: padding must not leak."""
    rng = np.random.RandomState(1)
    b, h, w_, k, n = 1, 5, 7, 32, 40
    x = jnp.asarray(rng.randn(b, h, w_, k), jnp.float32)
    kern = jnp.asarray(rng.randn(1, 1, k, n) * 0.1, jnp.float32)
    inv = jnp.ones((n,), jnp.float32)
    off = jnp.zeros((n,), jnp.float32)
    want = _ref(x, kern, inv, off, None, True)
    got = fused_conv1x1(x, kern, inv, off, relu=True, tile_m=64, tile_n=128)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_matches_unfused_bf16_semantics():
    """The kernel casts the accumulator to the compute dtype before the
    affine — exactly how the unfused bf16 path behaves."""
    rng = np.random.RandomState(2)
    b, h, w_, k, n = 1, 8, 8, 64, 128
    x = jnp.asarray(rng.randn(b, h, w_, k), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(1, 1, k, n) * 0.1, jnp.float32)
    inv = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)
    off = jnp.asarray(rng.randn(n) * 0.1, jnp.float32)
    res = jnp.asarray(rng.randn(b, h, w_, n), jnp.bfloat16)

    y = lax.conv_general_dilated(x, kern.astype(jnp.bfloat16), (1, 1), "VALID",
                                 dimension_numbers=DN)
    want = jnp.maximum(
        y * inv.astype(jnp.bfloat16) + off.astype(jnp.bfloat16) + res, 0
    )
    got = fused_conv1x1(x, kern, inv, off, residual=res, relu=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )
