"""exact_topk_lastdim must be indistinguishable from lax.top_k — values,
indices, and tie order (it feeds the NMS candidate gather, where order is
part of the greedy-NMS contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.ops.nms import exact_topk_lastdim


@pytest.mark.parametrize("n,k,groups", [
    (20000, 64, 8),
    (20000, 64, 7),     # non-dividing group count (padding path)
    (201600, 1024, 32),
    (500, 64, 8),       # too small -> fallback to lax.top_k
])
def test_matches_lax_topk(n, k, groups):
    x = jnp.asarray(np.random.RandomState(0).randn(3, n), jnp.float32)
    want_v, want_i = jax.lax.top_k(x, k)
    got_v, got_i = exact_topk_lastdim(x, k, groups=groups)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_tie_order_matches():
    """Duplicate values: lax.top_k breaks ties by lower index; the two-stage
    form must too (NMS keep sets depend on candidate order)."""
    rng = np.random.RandomState(1)
    x = rng.choice([0.1, 0.5, 0.9, -np.inf], size=(2, 40000)).astype(np.float32)
    xj = jnp.asarray(x)
    want_v, want_i = jax.lax.top_k(xj, 128)
    got_v, got_i = exact_topk_lastdim(xj, 128, groups=8)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_masked_scores_shape_like_nms_path():
    """The (B, C, N) masked-score layout used by the batched Pallas filter."""
    rng = np.random.RandomState(2)
    scores = jnp.asarray(rng.rand(4, 2, 60000), jnp.float32)
    masked = jnp.where(scores > 0.95, scores, -jnp.inf)
    want_v, want_i = jax.lax.top_k(masked, 256)
    got_v, got_i = exact_topk_lastdim(masked, 256, groups=16)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_under_vmap():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(5, 30000), jnp.float32)
    got_v, got_i = jax.vmap(lambda r: exact_topk_lastdim(r, 64, groups=8))(x)
    want_v, want_i = jax.vmap(lambda r: jax.lax.top_k(r, 64))(x)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
