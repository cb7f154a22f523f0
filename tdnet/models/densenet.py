"""DenseNet-BC 121/169/201 backbone (reference: models/densenet.py
DenseNetBackbone).

Standard DenseNet-BC: 7x7/2 stem + pool, dense blocks with growth 32 and
1x1(4k) bottlenecks, 0.5-compression transitions. C3/C4/C5 tap the outputs
of dense blocks 2/3/4 (strides 8/16/32), matching the reference's use of the
per-block concat outputs. BN frozen in inference mode (models/layers.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tdnet.models.layers import FrozenBatchNorm

__all__ = ["DenseNet", "DENSENET_BLOCKS"]

DENSENET_BLOCKS = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}


class _DenseLayer(nn.Module):
    growth_rate: int
    dtype: Any
    freeze_bn: bool

    @nn.compact
    def __call__(self, x):
        bn = lambda name: FrozenBatchNorm(frozen=self.freeze_bn, dtype=self.dtype, name=name)
        y = nn.relu(bn("bn1")(x))
        y = nn.Conv(4 * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    block_sizes: Sequence[int] = DENSENET_BLOCKS["densenet121"]
    growth_rate: int = 32
    dtype: Any = jnp.float32
    freeze_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        bn = lambda name: FrozenBatchNorm(frozen=self.freeze_bn, dtype=self.dtype, name=name)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        taps = []
        for b, n_layers in enumerate(self.block_sizes):
            for i in range(n_layers):
                x = _DenseLayer(self.growth_rate, self.dtype, self.freeze_bn,
                                name=f"block{b + 2}_layer{i}")(x)
            if b >= 1:
                taps.append(x)  # blocks 2/3/4 -> C3/C4/C5
            if b != len(self.block_sizes) - 1:
                # transition: BN-ReLU-1x1(compress 0.5)-avgpool/2
                x = nn.relu(bn(f"transition{b + 2}_bn")(x))
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"transition{b + 2}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return tuple(taps)
