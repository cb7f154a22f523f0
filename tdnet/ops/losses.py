"""Focal and smooth-L1 losses (pure jnp, mask-based).

Behavioral contract (SURVEY.md §3 "Losses"; reference: keras_retinanet/
losses.py ~L1-100):

- focal(alpha=0.25, gamma=2): over anchors with state != -1;
  alpha_t = alpha*y + (1-alpha)*(1-y); w = alpha_t * |y - p|^gamma;
  loss = sum(w * BCE(y, p)) / max(1, #positive anchors).
- smooth_l1(sigma=3): positives only; sigma^2 = 9; per-coordinate
  0.5*sigma^2*x^2 if |x| < 1/sigma^2 else |x| - 0.5/sigma^2;
  normalized by max(1, #positive anchors).

The reference gathers valid anchors with tf.where (dynamic shapes); here the
same math is expressed with masks so the loss is a single fused XLA reduction
with static shapes — required for TPU and mathematically identical.

Both factories accept `from_logits`: the reference's heads emit sigmoid
probabilities and Keras BCE clips them to [1e-7, 1-1e-7]; our model emits
logits (numerically stabler) and the loss uses the standard stable BCE
formulation. `from_logits=False` reproduces the reference's clipped-prob
path exactly for golden-value tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["focal", "smooth_l1"]

_KERAS_EPS = 1e-7


def _bce_from_probs(labels: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(probs, _KERAS_EPS, 1.0 - _KERAS_EPS)
    return -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))


def _bce_from_logits(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    # max(x, 0) - x*y + log(1 + exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def focal(alpha: float = 0.25, gamma: float = 2.0, from_logits: bool = True):
    """Factory returning focal_loss(y_true, y_pred) (reference: losses.py focal).

    y_true: (B, N, K+1) — one-hot labels + trailing anchor-state column
            (-1 ignore / 0 negative / 1 positive).
    y_pred: (B, N, K) — logits (default) or probabilities.
    Returns a scalar.
    """

    def _focal(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        labels = y_true[..., :-1]
        anchor_state = y_true[..., -1]

        probs = jax.nn.sigmoid(y_pred) if from_logits else y_pred
        bce = _bce_from_logits(labels, y_pred) if from_logits else _bce_from_probs(labels, y_pred)

        alpha_factor = jnp.where(labels == 1.0, alpha, 1.0 - alpha)
        focal_weight = jnp.where(labels == 1.0, 1.0 - probs, probs)
        focal_weight = alpha_factor * focal_weight ** gamma

        cls_loss = focal_weight * bce

        valid = (anchor_state != -1.0)[..., None]  # exclude ignored anchors
        cls_loss = jnp.where(valid, cls_loss, 0.0)

        normalizer = jnp.maximum(1.0, jnp.sum(anchor_state == 1.0).astype(cls_loss.dtype))
        return jnp.sum(cls_loss) / normalizer

    return _focal


def smooth_l1(sigma: float = 3.0):
    """Factory returning smooth_l1_loss(y_true, y_pred) (reference: losses.py
    smooth_l1).

    y_true: (B, N, 4+1) — regression targets + trailing anchor-state column.
    y_pred: (B, N, 4).
    Returns a scalar.
    """
    sigma_squared = sigma ** 2

    def _smooth_l1(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        regression_target = y_true[..., :-1]
        anchor_state = y_true[..., -1]

        diff = jnp.abs(y_pred - regression_target)
        loss = jnp.where(
            diff < 1.0 / sigma_squared,
            0.5 * sigma_squared * diff ** 2,
            diff - 0.5 / sigma_squared,
        )

        positive = (anchor_state == 1.0)[..., None]
        loss = jnp.where(positive, loss, 0.0)

        normalizer = jnp.maximum(1.0, jnp.sum(anchor_state == 1.0).astype(loss.dtype))
        return jnp.sum(loss) / normalizer

    return _smooth_l1
