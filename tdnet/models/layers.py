"""Shared model building blocks: frozen BatchNorm, TF1-exact nearest resize.

The reference fine-tunes with BatchNorm in inference mode (keras-resnet
`freeze_bn=True`; SURVEY.md §8 "Hard parts": replicate BN-in-inference-mode
or mAP parity silently fails). tdnet's BatchNorm therefore always normalizes
with stored moving statistics; `frozen=True` additionally stops gradients to
scale/bias so the affine stays at its imported values, exactly like a frozen
Keras layer.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["FrozenBatchNorm", "resize_nearest_like", "PriorProbability"]


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm (reference: keras_resnet.layers.BatchNormalization
    with freeze=True; eps matches keras-resnet's 1e-5).

    scale/bias live in 'params'; mean/var in 'batch_stats'. The normalization
    folds to a single multiply-add so XLA fuses it into the preceding conv.
    """

    epsilon: float = 1e-5
    frozen: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        ).value

        if self.frozen:
            scale = jax.lax.stop_gradient(scale)
            bias = jax.lax.stop_gradient(bias)

        # BN warm-up support (train/weights.py bn_warmup): expose this
        # batch's input moments, but ONLY when a warm-up pass asked for them
        # (apply(..., mutable=['bn_warmup'])). The guard keeps the collection
        # out of init() templates (checkpoint consumers iterate collections)
        # and skips two full-tensor reductions in eager/non-jit applies.
        if not self.is_initializing() and self.is_mutable_collection("bn_warmup"):
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            self.sow("bn_warmup", "mean", jnp.mean(xf, axis=axes))
            self.sow("bn_warmup", "sq_mean", jnp.mean(jnp.square(xf), axis=axes))

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        offset = bias - mean * inv
        return x * inv.astype(self.dtype) + offset.astype(self.dtype)


def resize_nearest_like(x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC `x` to (H, W) with TF1 semantics
    (align_corners=False: src = floor(dst * in/out)).

    Reference: layers/_misc.py UpsampleLike -> backend resize_images nearest.
    Shapes are static, so the gather indices are trace-time numpy constants —
    XLA lowers this to a cheap gather/broadcast.
    """
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = int(target_hw[0]), int(target_hw[1])
    if (h_in, w_in) == (h_out, w_out):
        return x
    rows = (np.arange(h_out) * h_in) // h_out
    cols = (np.arange(w_out) * w_in) // w_out
    return x[:, rows][:, :, cols]


class PriorProbability:
    """Bias initializer -log((1-p)/p) for the classification head
    (reference: initializers.py PriorProbability(0.01))."""

    def __init__(self, probability: float = 0.01):
        self.probability = probability

    def __call__(self, key, shape, dtype=jnp.float32):
        value = -np.log((1.0 - self.probability) / self.probability)
        return jnp.full(shape, value, dtype)
