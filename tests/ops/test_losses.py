"""Loss golden tests against a numpy oracle of the reference math
(reference: tests/test_losses.py style — numeric spot checks incl.
all-negative / ignore edge cases)."""

import numpy as np
import pytest

from tdnet.ops.losses import focal, smooth_l1


def _np_focal(y_true, y_pred_probs, alpha=0.25, gamma=2.0):
    labels = y_true[..., :-1]
    state = y_true[..., -1]
    p = np.clip(y_pred_probs, 1e-7, 1 - 1e-7)
    bce = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    alpha_f = np.where(labels == 1, alpha, 1 - alpha)
    w = alpha_f * np.where(labels == 1, 1 - y_pred_probs, y_pred_probs) ** gamma
    valid = (state != -1)[..., None]
    total = np.sum(np.where(valid, w * bce, 0.0))
    norm = max(1.0, float(np.sum(state == 1)))
    return total / norm


def _np_smooth_l1(y_true, y_pred, sigma=3.0):
    s2 = sigma ** 2
    target = y_true[..., :-1]
    state = y_true[..., -1]
    d = np.abs(y_pred - target)
    loss = np.where(d < 1.0 / s2, 0.5 * s2 * d ** 2, d - 0.5 / s2)
    pos = (state == 1)[..., None]
    total = np.sum(np.where(pos, loss, 0.0))
    norm = max(1.0, float(np.sum(state == 1)))
    return total / norm


def _random_case(seed, b=2, n=16, k=3):
    rng = np.random.RandomState(seed)
    state = rng.choice([-1.0, 0.0, 1.0], size=(b, n), p=[0.2, 0.6, 0.2])
    labels = np.zeros((b, n, k), dtype=np.float32)
    for i in range(b):
        for j in range(n):
            if state[i, j] == 1:
                labels[i, j, rng.randint(k)] = 1.0
    y_true_cls = np.concatenate([labels, state[..., None]], axis=-1).astype(np.float32)
    logits = rng.randn(b, n, k).astype(np.float32)

    reg_t = rng.randn(b, n, 4).astype(np.float32)
    y_true_reg = np.concatenate([reg_t, state[..., None]], axis=-1).astype(np.float32)
    reg_p = (reg_t + rng.randn(b, n, 4) * 0.5).astype(np.float32)
    return y_true_cls, logits, y_true_reg, reg_p


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_focal_matches_oracle(seed):
    y_true, logits, _, _ = _random_case(seed)
    probs = 1.0 / (1.0 + np.exp(-logits))
    got = float(focal(from_logits=True)(y_true, logits))
    want = _np_focal(y_true, probs)
    np.testing.assert_allclose(got, want, rtol=1e-4)

    got_probs = float(focal(from_logits=False)(y_true, probs))
    np.testing.assert_allclose(got_probs, want, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_smooth_l1_matches_oracle(seed):
    _, _, y_true, y_pred = _random_case(seed)
    got = float(smooth_l1()(y_true, y_pred))
    np.testing.assert_allclose(got, _np_smooth_l1(y_true, y_pred), rtol=1e-5)


def test_focal_all_negative_normalizer_one():
    # no positives: normalizer clamps to 1, loss = plain sum over negatives
    b, n, k = 1, 8, 2
    y_true = np.zeros((b, n, k + 1), dtype=np.float32)  # state 0 everywhere
    logits = np.full((b, n, k), -5.0, dtype=np.float32)
    got = float(focal()(y_true, logits))
    probs = 1.0 / (1.0 + np.exp(-logits))
    want = _np_focal(y_true, probs)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert got > 0


def test_ignored_anchors_contribute_nothing():
    b, n, k = 1, 4, 1
    y_true = np.zeros((b, n, k + 1), dtype=np.float32)
    y_true[..., -1] = -1.0  # everything ignored
    logits = np.random.RandomState(0).randn(b, n, k).astype(np.float32)
    assert float(focal()(y_true, logits)) == 0.0

    y_reg = np.zeros((b, n, 5), dtype=np.float32)
    y_reg[..., -1] = -1.0
    pred = np.ones((b, n, 4), dtype=np.float32)
    assert float(smooth_l1()(y_reg, pred)) == 0.0


def test_smooth_l1_breakpoint():
    # |d| exactly at 1/sigma^2 boundary: quadratic and linear branches agree
    s2 = 9.0
    y_true = np.zeros((1, 1, 5), dtype=np.float32)
    y_true[..., -1] = 1.0
    y_pred = np.full((1, 1, 4), 1.0 / s2, dtype=np.float32)
    got = float(smooth_l1()(y_true, y_pred))
    np.testing.assert_allclose(got, 4 * (1.0 / s2 - 0.5 / s2), rtol=1e-5)
