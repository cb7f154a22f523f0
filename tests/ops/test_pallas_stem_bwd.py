"""Backward fused-stem Pallas kernel (ops/pallas_stem.fused_stem_bwd_packed)
vs the jax.vjp of the XLA reference composition — including tie-heavy
constant inputs that exercise the maxpool first-match routing order.
Interpret mode, f32 (where the two are equivalent; the bf16 case, where
each backward follows its own forward's rounding, is covered by
tests/ops/test_stem_vjp.py::test_bf16_kernel_backward_matches_true_gradient_oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.ops.pallas_stem import fused_stem_bwd_packed
from tdnet.ops.stem_vjp import stem_reference_packed


def _params(f=16, seed=0):
    r = np.random.RandomState(seed)
    kernel7 = jnp.asarray(r.normal(0, 0.1, (7, 7, 3, f)).astype(np.float32))
    inv = jnp.asarray(r.uniform(0.5, 1.5, f).astype(np.float32))
    off = jnp.asarray(r.normal(0, 0.1, f).astype(np.float32))
    return kernel7, inv, off


def _ref_grads(packed, k7, inv, off, cot, mode):
    _, vjp = jax.vjp(
        lambda k, i, o: stem_reference_packed(
            packed, k, i, o, mode, jnp.float32),
        k7, inv, off,
    )
    return vjp(cot)


def _kernel_grads(packed, k7, inv, off, cot, mode, tm=2):
    return fused_stem_bwd_packed(
        packed, k7, inv, off, cot, normalize=mode, out_dtype=jnp.float32,
        interpret=True, tm=tm,
    )


def _check(packed, k7, inv, off, cot, mode, tm=2, atol=2e-2):
    rk, ri, ro = _ref_grads(packed, k7, inv, off, cot, mode)
    gk, gi, go = _kernel_grads(packed, k7, inv, off, cot, mode, tm=tm)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=1e-4, atol=atol, err_msg="dkernel7")
    np.testing.assert_allclose(np.asarray(gi), np.asarray(ri),
                               rtol=1e-4, atol=atol, err_msg="dbn_inv")
    np.testing.assert_allclose(np.asarray(go), np.asarray(ro),
                               rtol=1e-4, atol=atol, err_msg="dbn_off")


@pytest.mark.parametrize("mode", ["caffe", "tf"])
def test_random_input(mode):
    f = 16
    k7, inv, off = _params(f)
    b, h, w = 2, 32, 64
    raw = np.random.RandomState(1).randint(0, 256, (b, h, w, 3), np.uint8)
    packed = jnp.asarray(raw.reshape(b, h, w * 3))
    cot = jnp.asarray(np.random.RandomState(2).normal(
        0, 1, (b, h // 4, w // 4, f)).astype(np.float32))
    _check(packed, k7, inv, off, cot, mode)


def test_constant_regions_tie_routing():
    """Uniform background -> exactly equal conv outputs -> widespread pool
    ties; the kernel must route each window's gradient to the SAME single
    element XLA's select-and-scatter picks (first max, row-major)."""
    f = 16
    k7, inv, off = _params(f, seed=3)
    b, h, w = 1, 48, 64
    raw = np.full((b, h, w, 3), 245, np.uint8)   # constant page
    raw[:, 12:30, 20:44] = 60                    # one dark "table"
    packed = jnp.asarray(raw.reshape(b, h, w * 3))
    cot = jnp.asarray(np.random.RandomState(4).normal(
        0, 1, (b, h // 4, w // 4, f)).astype(np.float32))
    _check(packed, k7, inv, off, cot, "caffe")


def test_all_constant_input():
    # the fully-degenerate case: every window ties everywhere
    f = 16
    k7, inv, off = _params(f, seed=5)
    b, h, w = 1, 32, 32
    packed = jnp.asarray(np.full((b, h, w * 3), 128, np.uint8))
    cot = jnp.asarray(np.random.RandomState(6).normal(
        0, 1, (b, h // 4, w // 4, f)).astype(np.float32))
    _check(packed, k7, inv, off, cot, "caffe")


def test_tm_fallback_shapes():
    # H/4 = 10 with requested tm=4 -> divisor fallback; boundary rows are
    # shared between blocks and must not double-count
    f = 16
    k7, inv, off = _params(f, seed=7)
    b, h, w = 1, 40, 48
    raw = np.random.RandomState(8).randint(0, 256, (b, h, w, 3), np.uint8)
    packed = jnp.asarray(raw.reshape(b, h, w * 3))
    cot = jnp.asarray(np.random.RandomState(9).normal(
        0, 1, (b, h // 4, w // 4, f)).astype(np.float32))
    _check(packed, k7, inv, off, cot, "caffe", tm=4)


def test_zero_cotangent_gives_zero_grads():
    f = 16
    k7, inv, off = _params(f, seed=10)
    b, h, w = 1, 32, 32
    raw = np.random.RandomState(11).randint(0, 256, (b, h, w, 3), np.uint8)
    packed = jnp.asarray(raw.reshape(b, h, w * 3))
    cot = jnp.zeros((b, h // 4, w // 4, f), jnp.float32)
    gk, gi, go = _kernel_grads(packed, k7, inv, off, cot, "caffe")
    assert float(jnp.abs(gk).max()) == 0.0
    assert float(jnp.abs(gi).max()) == 0.0
    assert float(jnp.abs(go).max()) == 0.0
