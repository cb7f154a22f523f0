"""MobileNetV1 backbone (reference: models/mobilenet.py MobileNetBackbone,
alpha-scaled depthwise-separable stack; taps conv_pw_5 / conv_pw_11 /
conv_pw_13 relu outputs -> strides 8/16/32)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tdnet.models.layers import FrozenBatchNorm

__all__ = ["MobileNet"]

# (pointwise filters, stride) per depthwise-separable block, MobileNetV1
_BLOCKS = [
    (64, 1),
    (128, 2), (128, 1),
    (256, 2), (256, 1),          # block 5 output -> C3 (stride 8)
    (512, 2), (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),  # 11 -> C4
    (1024, 2), (1024, 1),        # 13 -> C5 (stride 32)
]


class MobileNet(nn.Module):
    alpha: float = 1.0
    dtype: Any = jnp.float32
    freeze_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        bn = lambda name: FrozenBatchNorm(
            frozen=self.freeze_bn, epsilon=1e-3, dtype=self.dtype, name=name
        )

        def relu6(v):
            return jnp.minimum(nn.relu(v), 6.0)

        x = nn.Conv(int(32 * self.alpha), (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = relu6(bn("bn_conv1")(x))

        taps = {}
        for i, (filters, stride) in enumerate(_BLOCKS, start=1):
            f = int(filters * self.alpha)
            # depthwise
            x = nn.Conv(x.shape[-1], (3, 3), strides=(stride, stride),
                        padding="SAME", feature_group_count=x.shape[-1],
                        use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv_dw_{i}")(x)
            x = relu6(bn(f"bn_dw_{i}")(x))
            # pointwise
            x = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_pw_{i}")(x)
            x = relu6(bn(f"bn_pw_{i}")(x))
            if i in (5, 11, 13):
                taps[i] = x
        return taps[5], taps[11], taps[13]
