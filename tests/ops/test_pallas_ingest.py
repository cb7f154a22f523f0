"""Pallas uint8 ingestion kernel vs the jnp normalization oracle
(interpret mode on CPU, same contract the TPU path compiles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.data.image import CAFFE_MEAN_BGR, preprocess_image_device
from tdnet.ops.pallas_ingest import normalize_uint8, supports_shape


def _canvas(shape, seed=0):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


def test_supports_shape():
    assert supports_shape((2, 32, 32, 3))       # 2*1024 px
    assert supports_shape((1, 800, 1344, 3))    # the product bucket
    assert supports_shape((1, 64, 128, 3))
    assert not supports_shape((1, 33, 33, 3))   # 1089 px not /1024
    assert not supports_shape((1, 32, 32, 4))   # not 3 channels
    assert not supports_shape((32, 32, 3))      # not batched


def test_caffe_exact_vs_jnp():
    x = _canvas((2, 32, 32, 3))
    got = normalize_uint8(jnp.asarray(x), mode="caffe", interpret=True)
    want = x.astype(np.float32) - CAFFE_MEAN_BGR
    np.testing.assert_array_equal(np.asarray(got), want)  # subtract is exact


def test_tf_mode_close():
    x = _canvas((1, 64, 48, 3), seed=1)
    got = normalize_uint8(jnp.asarray(x), mode="tf", interpret=True)
    want = (x.astype(np.float32) / 127.5) - 1.0
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    assert float(np.asarray(got).min()) >= -1.0 - 1e-6
    assert float(np.asarray(got).max()) <= 1.0 + 1e-6


def test_ragged_grid_tail_masked():
    # 20 rows with block_rows=8 -> 3 grid steps, last one masked
    x = _canvas((2, 64, 160, 3), seed=2)
    got = normalize_uint8(
        jnp.asarray(x), mode="caffe", interpret=True, block_rows=8
    )
    want = x.astype(np.float32) - CAFFE_MEAN_BGR
    np.testing.assert_array_equal(np.asarray(got), want)


def test_bf16_output_matches_cast():
    x = _canvas((1, 32, 64, 3), seed=3)
    got = normalize_uint8(
        jnp.asarray(x), mode="caffe", out_dtype=jnp.bfloat16, interpret=True
    )
    want = (x.astype(np.float32) - CAFFE_MEAN_BGR).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_rejects_bad_inputs():
    with pytest.raises(TypeError):
        normalize_uint8(jnp.zeros((1, 32, 32, 3), jnp.float32), interpret=True)
    with pytest.raises(ValueError, match="jnp fallback"):
        normalize_uint8(jnp.zeros((1, 33, 33, 3), jnp.uint8), interpret=True)


def test_dispatch_fallback_on_cpu_matches():
    # on CPU preprocess_image_device takes the jnp path for uint8; the
    # contract is that both paths agree, so the TPU dispatch is transparent
    x = _canvas((1, 32, 32, 3), seed=4)
    via_api = preprocess_image_device(jnp.asarray(x), "caffe")
    via_kernel = normalize_uint8(jnp.asarray(x), mode="caffe", interpret=True)
    np.testing.assert_array_equal(np.asarray(via_api), np.asarray(via_kernel))


def test_rows_general_width_matches_oracle():
    """normalize_uint8_rows on the packed train-step width (W3 = W*3, not
    3072) matches the numpy oracle exactly for caffe."""
    from tdnet.data.image import CAFFE_MEAN_BGR
    from tdnet.ops.pallas_ingest import normalize_uint8_rows

    r = np.random.RandomState(5)
    mat = r.randint(0, 256, (24, 96 * 3), dtype=np.uint8)  # W=96
    got = normalize_uint8_rows(jnp.asarray(mat), "caffe", interpret=True)
    want = mat.astype(np.float32) - np.tile(
        np.asarray(CAFFE_MEAN_BGR, np.float32), 96)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_rows_rejects_non_multiple_of_3():
    from tdnet.ops.pallas_ingest import normalize_uint8_rows

    with pytest.raises(ValueError):
        normalize_uint8_rows(
            jnp.zeros((4, 128), jnp.uint8), "caffe", interpret=True)


def test_pack_uint8_host_conventions():
    from tdnet.ops.pallas_ingest import pack_uint8_host

    x = np.arange(2 * 8 * 64 * 3, dtype=np.uint8).reshape(2, 8, 64, 3)
    packed = pack_uint8_host(x)
    assert packed.shape == (2, 8, 192)
    assert np.array_equal(packed.reshape(2, 8, 64, 3), x)

    # flat only when total divides 3072; else UNCHANGED (not repacked)
    y = np.zeros((1, 4, 256, 3), np.uint8)  # 3072 bytes total
    assert pack_uint8_host(y, flat=True).shape == (1, 3072)
    z = np.zeros((1, 5, 7, 3), np.uint8)
    assert pack_uint8_host(z, flat=True) is z

    # non-uint8 / non-NHWC pass through
    f = np.zeros((2, 8, 64, 3), np.float32)
    assert pack_uint8_host(f) is f
