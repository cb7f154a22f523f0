"""Fused ingest+stem Pallas kernel vs the XLA stem oracle
(StemConv + FrozenBatchNorm + ReLU + SAME 3x3/2 maxpool), interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tdnet.data.image import CAFFE_MEAN_BGR
from tdnet.ops.pallas_stem import fused_stem, supports_shape


def _xla_stem(x_norm_f32, kernel7, scale, bias, mean, var, eps=1e-5):
    """The exact reference stem segment (models/resnet.py:84-127,170-173)."""
    y = jax.lax.conv_general_dilated(
        x_norm_f32, kernel7.astype(jnp.float32), (2, 2),
        ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    inv = jax.lax.rsqrt(var + eps) * scale
    y = y * inv + (bias - mean * inv)
    y = nn.relu(y)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")


def _params(f=64, seed=0):
    r = np.random.RandomState(seed)
    kernel7 = jnp.asarray(r.normal(0, 0.1, (7, 7, 3, f)).astype(np.float32))
    scale = jnp.asarray(r.uniform(0.5, 1.5, f).astype(np.float32))
    bias = jnp.asarray(r.normal(0, 0.1, f).astype(np.float32))
    mean = jnp.asarray(r.normal(0, 0.5, f).astype(np.float32))
    var = jnp.asarray(r.uniform(0.5, 2.0, f).astype(np.float32))
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    off = bias - mean * inv
    return kernel7, scale, bias, mean, var, inv, off


def test_supports_shape():
    assert supports_shape((2, 64, 128, 3))
    assert supports_shape((1, 800, 1344, 3))
    assert not supports_shape((1, 66, 128, 3))
    assert not supports_shape((1, 64, 128, 4))


@pytest.mark.parametrize("hw", [(32, 64), (64, 128), (40, 48)])
def test_float_path_matches_xla_stem(hw):
    h, w = hw
    kernel7, scale, bias, mean, var, inv, off = _params()
    x = jnp.asarray(
        np.random.RandomState(1).normal(0, 50, (2, h, w, 3)).astype(np.float32)
    )
    want = _xla_stem(x, kernel7, scale, bias, mean, var)
    got = fused_stem(x, kernel7, inv, off, normalize=None,
                     out_dtype=jnp.float32, interpret=True)
    assert got.shape == (2, h // 4, w // 4, 64) == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-3
    )


def test_uint8_caffe_path_matches_normalize_then_stem():
    h, w = 64, 96
    kernel7, scale, bias, mean, var, inv, off = _params(seed=2)
    x8 = np.random.RandomState(3).randint(0, 256, (2, h, w, 3), np.uint8)
    x_norm = jnp.asarray(x8.astype(np.float32) - CAFFE_MEAN_BGR)
    want = _xla_stem(x_norm, kernel7, scale, bias, mean, var)
    got = fused_stem(jnp.asarray(x8), kernel7, inv, off, normalize="caffe",
                     out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-3
    )


def test_uint8_tf_mode():
    h, w = 32, 64
    kernel7, scale, bias, mean, var, inv, off = _params(seed=4)
    x8 = np.random.RandomState(5).randint(0, 256, (1, h, w, 3), np.uint8)
    x_norm = jnp.asarray(x8.astype(np.float32) / 127.5 - 1.0)
    want = _xla_stem(x_norm, kernel7, scale, bias, mean, var)
    got = fused_stem(jnp.asarray(x8), kernel7, inv, off, normalize="tf",
                     out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-4
    )


def test_tm_not_dividing_requested_falls_back():
    # H/4 = 10 with requested tm=8 -> largest divisor 5; still exact
    h, w = 40, 64
    kernel7, scale, bias, mean, var, inv, off = _params(seed=6)
    x = jnp.asarray(
        np.random.RandomState(7).normal(0, 30, (1, h, w, 3)).astype(np.float32)
    )
    want = _xla_stem(x, kernel7, scale, bias, mean, var)
    got = fused_stem(x, kernel7, inv, off, out_dtype=jnp.float32,
                     interpret=True, tm=8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-3
    )


def test_packed_form_equals_nhwc_form():
    # the jit-boundary form: (B, H, W*3) byte rows == reshape of NHWC
    from tdnet.ops.pallas_stem import fused_stem_packed

    h, w = 32, 64
    kernel7, scale, bias, mean, var, inv, off = _params(seed=8)
    x8 = np.random.RandomState(9).randint(0, 256, (2, h, w, 3), np.uint8)
    via_nhwc = fused_stem(jnp.asarray(x8), kernel7, inv, off,
                          normalize="caffe", out_dtype=jnp.float32,
                          interpret=True)
    via_packed = fused_stem_packed(
        jnp.asarray(x8.reshape(2, h, w * 3)), kernel7, inv, off,
        normalize="caffe", out_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(via_nhwc), np.asarray(via_packed))


def test_direct_nhwc_store_is_bit_identical():
    # direct=True writes NHWC from the kernel (in-kernel MXU identity
    # transpose) instead of channel-major rows + XLA untangle; same bits
    from tdnet.ops.pallas_stem import fused_stem_packed

    h, w = 32, 64
    kernel7, scale, bias, mean, var, inv, off = _params(seed=11)
    x8 = np.random.RandomState(12).randint(0, 256, (2, h, w * 3), np.uint8)
    base = fused_stem_packed(jnp.asarray(x8), kernel7, inv, off,
                             normalize="caffe", out_dtype=jnp.bfloat16,
                             interpret=True, direct=False)
    direct = fused_stem_packed(jnp.asarray(x8), kernel7, inv, off,
                               normalize="caffe", out_dtype=jnp.bfloat16,
                               interpret=True, direct=True)
    np.testing.assert_array_equal(
        np.asarray(base.astype(jnp.float32)),
        np.asarray(direct.astype(jnp.float32)))


def test_rejects_bad_inputs():
    kernel7, _, _, _, _, inv, off = _params()
    with pytest.raises(TypeError, match="normalize requires uint8"):
        fused_stem(jnp.zeros((1, 32, 64, 3), jnp.float32), kernel7, inv, off,
                   normalize="caffe", interpret=True)
    with pytest.raises(TypeError, match="requires a normalize mode"):
        fused_stem(jnp.zeros((1, 32, 64, 3), jnp.uint8), kernel7, inv, off,
                   interpret=True)


def test_stem_input_model_matches_full_model():
    """RetinaNet(stem_input=True) on fused-stem activations == the full
    model on the normalized images, with the SAME variables (the fused
    inference path: ship packed uint8, Pallas ingest+stem, model from C2)."""
    from tdnet.models.resnet import stem_params_from_variables
    from tdnet.models.retinanet import RetinaNet
    from tdnet.ops.pallas_stem import fused_stem_packed

    full = RetinaNet(num_classes=2, dtype=jnp.float32)
    variables = full.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))

    r = np.random.RandomState(3)
    raw = r.randint(0, 256, (2, 64, 128, 3)).astype(np.uint8)
    x_norm = jnp.asarray(raw.astype(np.float32) - np.asarray(CAFFE_MEAN_BGR))
    want = full.apply(variables, x_norm)

    k7, inv, off = stem_params_from_variables(variables)
    act = fused_stem_packed(
        jnp.asarray(raw.reshape(2, 64, 128 * 3)), k7, inv, off,
        normalize="caffe", out_dtype=jnp.float32, interpret=True,
    )
    stem_model = RetinaNet(num_classes=2, dtype=jnp.float32, stem_input=True)
    got = stem_model.apply(variables, act)

    for key in ("regression", "classification"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]),
            rtol=2e-4, atol=2e-3,
        )


def test_resolve_tm_never_picks_odd_multiblock():
    # Mosaic requires the window row offset 4*tm*mi to be 8-sublane
    # aligned: an odd tm with more than one grid step is a hard TPU
    # compile error (verified on v5e: h=24 resolved 4 -> 3 under the old
    # "largest divisor" rule and aborted in Mosaic). Odd tm is legal only
    # single-block (tm == H/4, offset always 0).
    from tdnet.ops.pallas_stem import _resolve_tm, supports_shape

    assert _resolve_tm(24, 4) == 2      # not 3: 6 % 3 == 0 but odd
    assert _resolve_tm(32, 4) == 4
    assert _resolve_tm(16, 4) == 4
    assert _resolve_tm(8, 4) == 2
    assert _resolve_tm(800, 4) == 4
    # supports_shape gates out H % 8 != 0 (odd H/4 has no even divisor)
    assert not supports_shape((1, 20, 64, 3))
    assert not supports_shape((1, 28, 64, 3))
    assert supports_shape((1, 24, 64, 3))


def test_h24_tm4_regression_matches_reference():
    # the exact shape/tm combination that failed to compile under the old
    # _resolve_tm rule; assert the resolved kernel still computes the stem
    from tdnet.ops.pallas_stem import fused_stem_packed
    from tdnet.ops.stem_vjp import stem_reference_packed

    kernel7, scale, bias, mean, var, inv, off = _params(seed=3)
    x8 = np.random.RandomState(4).randint(0, 256, (2, 24, 64 * 3), np.uint8)
    got = fused_stem_packed(jnp.asarray(x8), kernel7, inv, off,
                            normalize="caffe", out_dtype=jnp.float32,
                            interpret=True, tm=4)
    want = stem_reference_packed(jnp.asarray(x8), kernel7, inv, off,
                                 "caffe", jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-3)
