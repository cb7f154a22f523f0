"""VGG-16/19 backbone (reference: models/vgg.py VGGBackbone).

Taps the block3/block4/block5 pool outputs as C3/C4/C5 (strides 8/16/32),
like the reference's layer_names ['block3_pool', 'block4_pool',
'block5_pool']. Caffe-mode preprocessing. No BN (faithful to VGG).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VGG", "VGG_STAGES"]

# convs per block
VGG_STAGES = {
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}
_WIDTHS = (64, 128, 256, 512, 512)


class VGG(nn.Module):
    stage_sizes: Sequence[int] = VGG_STAGES["vgg16"]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        taps = []
        for block, (n_convs, width) in enumerate(zip(self.stage_sizes, _WIDTHS)):
            for i in range(n_convs):
                x = nn.Conv(
                    width, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"block{block + 1}_conv{i + 1}",
                )(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if block >= 2:  # block3/4/5 pools
                taps.append(x)
        return tuple(taps)  # C3, C4, C5
