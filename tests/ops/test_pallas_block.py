"""Fused bottleneck-block kernel (ops/pallas_block.py) vs the XLA lowering.

Same oracle style as tests/ops/test_pallas_stem.py: build the exact XLA op
sequence the kernel replaces (conv1x1-BN-ReLU -> conv3x3 SAME-BN-ReLU ->
conv1x1-BN + residual -> ReLU, frozen BN folded to inv/off, f32 matmul
accumulation with intermediates rounded through the compute dtype) and
require near-bit equality in f32 / tight-rel in bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdnet.ops.pallas_block import fused_bottleneck, supports_block


def xla_block(x, w1, w2, w3, p):
    """The reference op sequence (what models/resnet.py's identity block
    computes with folded frozen BN)."""
    dt = x.dtype
    t1 = jax.lax.conv_general_dilated(
        x.astype(dt), w1[None, None].astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    t1 = jnp.maximum(t1 * p["i1"] + p["o1"], 0.0).astype(dt)
    t2 = jax.lax.conv_general_dilated(
        t1, w2.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    t2 = jnp.maximum(t2 * p["i2"] + p["o2"], 0.0).astype(dt)
    t3 = jax.lax.conv_general_dilated(
        t2, w3[None, None].astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(t3 * p["i3"] + p["o3"] + x.astype(jnp.float32), 0.0)
    return y.astype(dt)


def _setup(rng, b, h, w, c, m, dtype):
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((c, m)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, m, m)) * 0.05, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((m, c)) * 0.1, jnp.float32)
    p = {
        "i1": jnp.asarray(rng.uniform(0.5, 1.5, (m,)), jnp.float32),
        "o1": jnp.asarray(rng.standard_normal((m,)) * 0.1, jnp.float32),
        "i2": jnp.asarray(rng.uniform(0.5, 1.5, (m,)), jnp.float32),
        "o2": jnp.asarray(rng.standard_normal((m,)) * 0.1, jnp.float32),
        "i3": jnp.asarray(rng.uniform(0.5, 1.5, (c,)), jnp.float32),
        "o3": jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
    }
    return x, w1, w2, w3, p


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_fused_block_matches_xla(dtype, tol):
    rng = np.random.default_rng(0)
    b, h, w, c, m = 2, 16, 32, 64, 8
    x, w1, w2, w3, p = _setup(rng, b, h, w, c, m, dtype)
    assert supports_block(x.shape, m)

    ref = xla_block(x, w1, w2, w3, p)
    got = fused_bottleneck(
        x, w1, w2, w3, p["i1"], p["o1"], p["i2"], p["o2"], p["i3"], p["o3"],
        tm=8)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol)


def test_fused_block_row_edges_and_single_tile():
    """SAME row padding at the image top/bottom is the kernel's masked-halo
    path — exercise several (H, tm) combinations incl. a single row-block
    (tm == H) and multi-block grids where halos cross tiles."""
    rng = np.random.default_rng(1)
    for h, tm in [(8, 8), (16, 8), (24, 8), (16, 16), (32, 8)]:
        x, w1, w2, w3, p = _setup(rng, 1, h, 16, 64, 8, jnp.float32)
        ref = xla_block(x, w1, w2, w3, p)
        got = fused_bottleneck(
            x, w1, w2, w3, p["i1"], p["o1"], p["i2"], p["o2"],
            p["i3"], p["o3"], tm=tm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fused_block_rejects_bad_shapes():
    x = jnp.zeros((1, 16, 32, 64), jnp.float32)
    with pytest.raises(ValueError, match="bad weight shapes"):
        fused_bottleneck(
            x, jnp.zeros((64, 8)), jnp.zeros((3, 3, 8, 9)),
            jnp.zeros((8, 64)), *([jnp.zeros((8,))] * 4),
            *([jnp.zeros((64,))] * 2))


def test_model_block_kernel_equivalence():
    """RetinaNet(block_kernel=True) is variable-compatible with the XLA
    model (same init tree) and produces the same outputs (interpret mode
    off-TPU). The Predictor enables this path on TPU ResNets."""
    import jax

    from tdnet.models.retinanet import RetinaNet

    base = RetinaNet(num_classes=2, dtype=jnp.float32)
    fused = base.clone(block_kernel=True)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    v_base = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    v_fused = jax.jit(fused.init)(jax.random.PRNGKey(0), x)
    # identical variable trees (paths AND init values)
    assert (jax.tree_util.tree_structure(v_base)
            == jax.tree_util.tree_structure(v_fused))
    for a, b in zip(jax.tree.leaves(v_base), jax.tree.leaves(v_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_base = base.apply(v_base, x)
    out_fused = fused.apply(v_base, x)
    for k in out_base:
        np.testing.assert_allclose(
            np.asarray(out_base[k]), np.asarray(out_fused[k]),
            rtol=2e-4, atol=2e-4)


def test_fused_chain_matches_xla_stack():
    """A depth-D chain equals D stacked XLA blocks (the whole identity run
    of a stage in ONE kernel — inter-block activations never leave VMEM)."""
    from tdnet.ops.pallas_block import fused_bottleneck_chain

    rng = np.random.default_rng(3)
    for depth, h, tm in [(2, 16, 8), (3, 20, 4), (3, 12, 12)]:
        b, w_, c, m = 2, 24, 64, 8
        x, _, _, _, _ = _setup(rng, b, h, w_, c, m, jnp.float32)
        blocks = []
        ref = x
        for _ in range(depth):
            _, w1, w2, w3, p = _setup(rng, 1, 8, 8, c, m, jnp.float32)
            blocks.append((w1, w2, w3, p))
            ref = xla_block(ref, w1, w2, w3, p)
        got = fused_bottleneck_chain(
            x,
            jnp.stack([bl[0] for bl in blocks]),
            jnp.stack([bl[1] for bl in blocks]),
            jnp.stack([bl[2] for bl in blocks]),
            jnp.stack([bl[3]["i1"] for bl in blocks]),
            jnp.stack([bl[3]["o1"] for bl in blocks]),
            jnp.stack([bl[3]["i2"] for bl in blocks]),
            jnp.stack([bl[3]["o2"] for bl in blocks]),
            jnp.stack([bl[3]["i3"] for bl in blocks]),
            jnp.stack([bl[3]["o3"] for bl in blocks]),
            tm=tm)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)
