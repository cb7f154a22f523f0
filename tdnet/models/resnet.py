"""ResNet-50/101/152 backbone with C3/C4/C5 taps (flax).

Architecture matches the reference's vendored keras-resnet v1 bottleneck
network exactly (reference: models/resnet.py ResNetBackbone + the external
keras-resnet package it wraps), so Keras h5 weights map 1:1:

- stem: explicit (3,3) zero-pad -> 7x7/2 conv (no bias) -> BN -> ReLU ->
  3x3/2 max-pool with TF 'SAME' padding.
- bottleneck blocks, stride on the FIRST 1x1 conv ("caffe style"), projection
  shortcut on each stage's first block; stage strides 1,2,2,2 after the pool.
- all BatchNorm frozen in inference mode (keras-resnet freeze_bn regime).

TPU-first choices: NHWC layout, bfloat16 compute / float32 params (MXU-
friendly), BN folded to multiply-add so XLA fuses it into the convs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tdnet.models.layers import FrozenBatchNorm

__all__ = ["ResNet", "STAGE_SIZES"]

STAGE_SIZES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class _ConvKernel(nn.Module):
    """Declares exactly the param nn.Conv would ({name}/kernel, same shape,
    same lecun_normal init keyed by the same path) and returns its VALUE —
    lets the fused-block path below feed raw weights to the Pallas kernel
    while staying checkpoint-identical to the XLA path."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _BNFolded(nn.Module):
    """Declares FrozenBatchNorm's exact variables and returns the folded
    (inv, off) pair (eps 1e-5, keras-resnet parity — models/layers.py)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32)).value
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32)).value
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return inv, bias - mean * inv


class _BlockParams(nn.Module):
    """One identity block's raw weights for the fused chain kernel —
    declares the exact variable tree a Bottleneck would (conv1/2/3 +
    bn1/2/3) under the same name and returns the values the kernel wants:
    (w1 (C,M), w2 (3,3,M,M), w3 (M,C), bn inv/off pairs)."""

    cin: int
    cmid: int

    @nn.compact
    def __call__(self):
        k1 = _ConvKernel((1, 1, self.cin, self.cmid), name="conv1")()
        k2 = _ConvKernel((3, 3, self.cmid, self.cmid), name="conv2")()
        k3 = _ConvKernel((1, 1, self.cmid, self.cin), name="conv3")()
        i1, o1 = _BNFolded(self.cmid, name="bn1")()
        i2, o2 = _BNFolded(self.cmid, name="bn2")()
        i3, o3 = _BNFolded(self.cin, name="bn3")()
        return (k1[0, 0], k2, k3[0, 0], i1, o1, i2, o2, i3, o3)


class Bottleneck(nn.Module):
    """1x1(/s) -> 3x3 -> 1x1(*4) bottleneck with post-activation residual.

    se_ratio > 0 inserts a squeeze-excitation gate before the residual add
    (SE-ResNet — the reference's senet.py family, models/senet.py).

    use_block_kernel=True routes stride-1 identity blocks through the
    fused VMEM-resident Pallas kernel (ops/pallas_block.py) — same
    variables, same math (f32-accumulated matmuls, intermediates rounded
    through self.dtype); projection/strided/SE blocks and unsupported
    shapes stay on the XLA path. Inference-only (the kernel has no VJP)."""

    filters: int
    stride: int = 1
    projection: bool = False
    se_ratio: float = 0.0
    dtype: Any = jnp.float32
    freeze_bn: bool = True
    use_block_kernel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME" if k > 1 else "VALID",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: FrozenBatchNorm(
            frozen=self.freeze_bn, dtype=self.dtype, name=name
        )

        if (self.use_block_kernel and not self.projection
                and self.stride == 1 and self.se_ratio == 0
                and self.freeze_bn and x.ndim == 4
                and x.shape[-1] == 4 * self.filters):
            from tdnet.ops.pallas_block import fused_bottleneck, supports_block

            if supports_block(x.shape, self.filters):
                cin, m = x.shape[-1], self.filters
                k1 = _ConvKernel((1, 1, cin, m), name="conv1")()
                k2 = _ConvKernel((3, 3, m, m), name="conv2")()
                k3 = _ConvKernel((1, 1, m, cin), name="conv3")()
                i1, o1 = _BNFolded(m, name="bn1")()
                i2, o2 = _BNFolded(m, name="bn2")()
                i3, o3 = _BNFolded(cin, name="bn3")()
                return fused_bottleneck(
                    x.astype(self.dtype), k1[0, 0], k2, k3[0, 0],
                    i1, o1, i2, o2, i3, o3)

        y = conv(self.filters, 1, self.stride, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.filters, 3, 1, "conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = conv(self.filters * 4, 1, 1, "conv3")(y)
        y = bn("bn3")(y)

        if self.se_ratio > 0:
            squeeze = jnp.mean(y, axis=(1, 2), keepdims=True)
            hidden = max(1, int(self.filters * 4 * self.se_ratio))
            s = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name="se_reduce")(squeeze)
            s = nn.relu(s)
            s = nn.Dense(self.filters * 4, dtype=self.dtype,
                         param_dtype=jnp.float32, name="se_expand")(s)
            y = y * jax.nn.sigmoid(s)

        if self.projection:
            shortcut = conv(self.filters * 4, 1, self.stride, "conv_shortcut")(x)
            shortcut = bn("bn_shortcut")(shortcut)
        else:
            shortcut = x
        return nn.relu(y + shortcut)


class StemConv(nn.Module):
    """The ResNet stem conv: explicit pad 3 + valid 7x7/2 (keras-resnet
    ZeroPadding2D(3); NOT 'SAME' — for even inputs SAME pads (2,3) and
    shifts by a pixel).

    `s2d=True` uses the space-to-depth reformulation (cf. MLPerf ResNet):
    zero-extend the kernel to 8x8 (v[1:,1:]=w), pad the input by 4,
    rearrange 2x2 spatial blocks into channels, and run the equivalent
    4x4/1 conv over 12 channels — identical math (out[i,j] =
    sum_k w[k] x[2i+k-3, ...] term for term).

    MEASURED NEGATIVE RESULT (v5e, batch 32, 800x1344, bf16 —
    tools/perf_stem.py): plain 16.5 ms, in-graph s2d 22.1 ms — XLA's own
    C=3 conv lowering already beats paying the 2x2 rearrangement per step,
    so the default stays the plain conv. The s2d path is kept for
    ingestion-level s2d experiments (host emits s2d canvases; the MLPerf
    formulation) where the rearrangement leaves the step entirely.

    The parameter is stored as the canonical (7, 7, 3, F) kernel either
    way, so checkpoints and the Keras h5 importer are layout-stable.
    """

    features: int = 64
    dtype: Any = jnp.float32
    s2d: Optional[bool] = None  # None -> plain conv (see negative result)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
            jnp.float32,
        )
        use_s2d = bool(self.s2d)
        if use_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            return self._s2d_conv(x, kernel)
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dtype),
            window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _s2d_conv(self, x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
        c = kernel.shape[2]
        f = self.features
        # v[k'] = w[k'-1] so out[i] = sum_{k'} v[k'] z[2i+k'] with z padded 4
        v = jnp.zeros((8, 8, c, f), kernel.dtype).at[1:, 1:].set(kernel)
        # k4[q, r, (ph*2+pw)*C + c] = v[2q+ph, 2r+pw, c]
        k4 = (
            v.reshape(4, 2, 4, 2, c, f)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, f)
        )
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        b, hp, wp, _ = xp.shape
        u = (
            xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, hp // 2, wp // 2, 4 * c)
        )
        y = jax.lax.conv_general_dilated(
            u,
            k4.astype(self.dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # VALID over (H/2+4) taps-4 gives H/2+1 rows; the true output is H/2
        return y[:, : x.shape[1] // 2, : x.shape[2] // 2, :]


def stem_params_from_variables(variables: dict):
    """(kernel7 (7,7,3,64), bn_inv (64,), bn_off (64,)) for the fused
    ingest+stem kernel (ops/pallas_stem.fused_stem_packed), folded exactly
    like FrozenBatchNorm (eps 1e-5): inv = rsqrt(var+eps)*scale,
    off = bias - mean*inv."""
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]["bn1"]
    inv = jax.lax.rsqrt(s["var"] + 1e-5) * p["bn1"]["scale"]
    off = p["bn1"]["bias"] - s["mean"] * inv
    return p["conv1"]["kernel"], inv, off


class ResNet(nn.Module):
    """Returns (C3, C4, C5) feature maps at strides 8/16/32."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    se_ratio: float = 0.0  # > 0 -> SE-ResNet (reference: models/senet.py)
    dtype: Any = jnp.float32
    freeze_bn: bool = True
    s2d_stem: Optional[bool] = None  # None/False -> plain conv (measured
    # faster than in-graph s2d on v5e; see StemConv's negative result)
    stem_input: bool = False  # input IS the pooled stem activations
    # (B, H/4, W/4, 64) — the fused ingest+stem Pallas kernel
    # (ops/pallas_stem.py) computes them outside the module; conv1/bn1
    # params stay in the tree (unused) so one checkpoint serves both forms
    block_kernel: bool = False  # identity bottlenecks via the fused
    # VMEM-resident Pallas block kernel (ops/pallas_block.py) —
    # inference-only, same variables (see Bottleneck.use_block_kernel)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        if not self.stem_input:
            x = StemConv(features=64, dtype=self.dtype, s2d=self.s2d_stem,
                         name="conv1")(x)
            x = nn.relu(FrozenBatchNorm(frozen=self.freeze_bn,
                                        dtype=self.dtype, name="bn1")(x))
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        outputs = []
        filters = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(
                filters=filters,
                stride=stride,
                projection=True,
                se_ratio=self.se_ratio,
                dtype=self.dtype,
                freeze_bn=self.freeze_bn,
                name=f"stage{stage + 2}_block0",
            )(x)
            # the stage's identity run: one fused chain kernel when
            # enabled/supported (all inter-block activations stay in
            # VMEM — ops/pallas_block.py), else per-block XLA
            x = self._identity_run(x, stage, num_blocks - 1, filters)
            outputs.append(x)
            filters *= 2

        c3, c4, c5 = outputs[1], outputs[2], outputs[3]
        return c3, c4, c5

    def _identity_run(self, x, stage: int, n: int, filters: int):
        if n <= 0:
            return x
        fuse = (self.block_kernel and self.se_ratio == 0 and self.freeze_bn
                and x.ndim == 4 and x.shape[-1] == 4 * filters)
        if fuse:
            from tdnet.ops.pallas_block import (fused_bottleneck_chain,
                                                supports_block)

            fuse = supports_block(x.shape, filters)
        if not fuse:
            for block in range(1, n + 1):
                x = Bottleneck(
                    filters=filters,
                    stride=1,
                    projection=False,
                    se_ratio=self.se_ratio,
                    dtype=self.dtype,
                    freeze_bn=self.freeze_bn,
                    use_block_kernel=self.block_kernel,
                    name=f"stage{stage + 2}_block{block}",
                )(x)
            return x
        raw = [
            _BlockParams(cin=x.shape[-1], cmid=filters,
                         name=f"stage{stage + 2}_block{block}")()
            for block in range(1, n + 1)
        ]
        # chunk long runs (ResNet-101's stage4 has 22 identity blocks —
        # a single chain would put ~26 MB of stacked weights in VMEM);
        # each chunk's weights + window must fit alongside the im2col
        import os as _os

        max_depth = max(1, int(_os.environ.get("TDNET_CHAIN_DEPTH", "3")))
        for start in range(0, len(raw), max_depth):
            chunk = raw[start:start + max_depth]
            stack = lambda j, c=chunk: jnp.stack([r[j] for r in c])
            x = fused_bottleneck_chain(
                x.astype(self.dtype), stack(0), stack(1), stack(2),
                stack(3), stack(4), stack(5), stack(6), stack(7), stack(8))
        return x
