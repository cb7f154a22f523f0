"""LR schedule plumbing + orbax checkpoint round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tdnet.train.checkpoint import Checkpointer
from tdnet.train.loop import ReduceLROnPlateau, get_learning_rate, set_learning_rate
from tdnet.train.step import TrainState, clip_by_leaf_norm, create_optimizer


def _toy_state(tx):
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={},
        opt_state=tx.init(params),
        tx=tx,
    )


def test_get_set_learning_rate_plain_chain():
    tx = create_optimizer(learning_rate=1e-5)
    state = _toy_state(tx)
    assert get_learning_rate(state.opt_state) == pytest.approx(1e-5)
    new = set_learning_rate(state.opt_state, 1e-6)
    assert get_learning_rate(new) == pytest.approx(1e-6)


def test_get_set_learning_rate_through_multi_transform():
    inner = create_optimizer(learning_rate=1e-4)
    labels = {"w": "trainable", "b": "frozen"}
    tx = optax.multi_transform(
        {"trainable": inner, "frozen": optax.set_to_zero()}, labels
    )
    state = _toy_state(tx)
    assert get_learning_rate(state.opt_state) == pytest.approx(1e-4)
    new = set_learning_rate(state.opt_state, 5e-5)
    assert get_learning_rate(new) == pytest.approx(5e-5)


def test_set_learning_rate_changes_updates():
    tx = create_optimizer(learning_rate=1.0, clipnorm=1e9)
    state = _toy_state(tx)
    grads = {"w": jnp.ones((3,)), "b": jnp.ones((2,))}
    s1 = state.apply_gradients(grads)
    step1 = float(np.abs(np.asarray(s1.params["w"]) - 1.0).max())

    state2 = state.replace(opt_state=set_learning_rate(state.opt_state, 0.1))
    s2 = state2.apply_gradients(grads)
    step2 = float(np.abs(np.asarray(s2.params["w"]) - 1.0).max())
    assert step2 == pytest.approx(step1 * 0.1, rel=1e-3)


def test_reduce_lr_on_plateau_semantics():
    sched = ReduceLROnPlateau(factor=0.1, patience=2, verbose=False)
    lr = 1e-3
    lr = sched.update(1.0, lr)   # improvement (best=inf -> 1.0)
    assert lr == 1e-3
    lr = sched.update(1.0, lr)   # no improvement (wait 1)
    assert lr == 1e-3
    lr = sched.update(1.0, lr)   # no improvement (wait 2 -> reduce)
    assert lr == pytest.approx(1e-4)
    lr = sched.update(0.5, lr)   # new best -> no change
    assert lr == pytest.approx(1e-4)


def test_checkpoint_roundtrip(tmp_path):
    tx = create_optimizer(learning_rate=1e-5)
    state = _toy_state(tx)
    state = state.apply_gradients({"w": jnp.ones((3,)), "b": jnp.ones((2,))})

    ckpt = Checkpointer(str(tmp_path / "snaps"))
    ckpt.save(1, state, wait=True)
    assert ckpt.latest_step() == 1

    fresh = _toy_state(tx)
    restored = ckpt.restore(fresh)
    np.testing.assert_allclose(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    assert int(restored.step) == 1
    # opt state (adam moments) restored too
    assert get_learning_rate(restored.opt_state) == pytest.approx(1e-5)
    ckpt.close()


def test_checkpoint_restore_missing_raises(tmp_path):
    ckpt = Checkpointer(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ckpt.restore(_toy_state(create_optimizer()))
    ckpt.close()


def test_loss_spike_warning(tmp_path, capsys):
    """A >10x single-epoch loss jump must be flagged loudly (the product
    guard for the measured round-3 Adam divergence) — in stdout AND as
    loss_spike in the metrics JSONL."""
    import itertools
    import json as _json

    import numpy as np

    from tdnet.train.loop import fit

    class StubState:
        step = 0

    losses = iter([1.0, 50.0, 49.0])  # spike at epoch 1 only

    def stub_step(state, batch):
        return state, {"loss": next(losses)}

    batches = itertools.repeat({"images": np.zeros((1, 4, 4, 3))})
    metrics_path = str(tmp_path / "m.jsonl")
    fit(StubState(), stub_step, batches, steps_per_epoch=1, epochs=3,
        log_every=10**9, metrics_path=metrics_path)

    out = capsys.readouterr().out
    assert "loss jumped" in out and "50.0" in out
    recs = [_json.loads(l) for l in open(metrics_path)]
    spikes = [r for r in recs if r.get("loss_spike")]
    assert len(spikes) == 1 and spikes[0]["epoch"] == 1


def test_eval_every_schedule(tmp_path):
    """evaluate_fn runs every Nth epoch and always on the final epoch."""
    import itertools

    import numpy as np

    from tdnet.train.loop import fit

    class StubState:
        step = 0

    calls = []

    def stub_step(state, batch):
        return state, {"loss": 1.0}

    def eval_fn(state):
        calls.append(1)
        return {"mAP": 0.5}

    batches = itertools.repeat({"images": np.zeros((1, 4, 4, 3))})
    fit(StubState(), stub_step, batches, steps_per_epoch=1, epochs=5,
        log_every=10**9, evaluate_fn=eval_fn, eval_every=2,
        metrics_path=str(tmp_path / "m.jsonl"))
    # epochs 1, 3 (every 2nd) + final epoch 4 -> 3 calls
    assert len(calls) == 3

    calls.clear()
    fit(StubState(), stub_step, batches, steps_per_epoch=1, epochs=3,
        log_every=10**9, evaluate_fn=eval_fn,
        metrics_path=str(tmp_path / "m2.jsonl"))
    assert len(calls) == 3  # default: every epoch


def test_host_rss_metric_present(tmp_path):
    import itertools
    import json as _json

    import numpy as np

    from tdnet.train.loop import fit

    class StubState:
        step = 0

    batches = itertools.repeat({"images": np.zeros((1, 4, 4, 3))})
    path = str(tmp_path / "m.jsonl")
    fit(StubState(), lambda s, b: (s, {"loss": 1.0}), batches,
        steps_per_epoch=1, epochs=1, log_every=10**9, metrics_path=path)
    recs = [_json.loads(l) for l in open(path)]
    assert any(r.get("host_rss_mb", 0) > 0 for r in recs)


def test_rss_budget_stop(tmp_path):
    """--rss-budget-mb machinery: fit() raises RssBudgetExceeded AFTER the
    epoch checkpoint when host RSS crosses the budget (any live process
    exceeds 1 MB), never on the final epoch, and not when unset."""
    import itertools

    import numpy as np

    from tdnet.train.loop import RssBudgetExceeded, fit

    class StubState:
        step = 0

    class StubCkpt:
        def __init__(self):
            self.saved = []
            self.waited = 0

        def save(self, step, state):
            self.saved.append(step)

        def wait(self):
            self.waited += 1

    batches = itertools.repeat({"images": np.zeros((1, 4, 4, 3))})
    ckpt = StubCkpt()
    with pytest.raises(RssBudgetExceeded) as e:
        fit(StubState(), lambda s, b: (s, {"loss": 1.0}), batches,
            steps_per_epoch=1, epochs=3, log_every=10**9,
            checkpointer=ckpt, rss_budget_mb=1.0,
            metrics_path=str(tmp_path / "m.jsonl"))
    assert e.value.epoch == 0 and e.value.rss_mb > 1.0
    assert ckpt.saved == [0]          # checkpoint precedes the stop
    assert ckpt.waited == 1           # fit's finally flushed the save

    # the final epoch completes instead of stopping (nothing to resume)
    ckpt = StubCkpt()
    fit(StubState(), lambda s, b: (s, {"loss": 1.0}), batches,
        steps_per_epoch=1, epochs=1, log_every=10**9,
        checkpointer=ckpt, rss_budget_mb=1.0,
        metrics_path=str(tmp_path / "m2.jsonl"))
    assert ckpt.saved == [0]


def test_has_opt_state_from_fresh_manager(tmp_path):
    """has_opt_state must work from a FRESH Checkpointer over an existing
    directory — the resume path is exactly that (round-5 regression: a
    fresh CheckpointManager returns None item_metadata until a handler is
    registered, and the old None->{} fallthrough classified every resume
    snapshot as optimizer-less, silently restarting Adam and breaking
    trajectory fidelity; caught by test_resume_fidelity_slow.py)."""
    tx = create_optimizer(learning_rate=1e-5)
    state = _toy_state(tx)
    ckpt = Checkpointer(str(tmp_path / "full"))
    ckpt.save(3, state, wait=True)
    ckpt.close()
    assert Checkpointer(str(tmp_path / "full")).has_opt_state() is True

    class _WeightsOnly:
        params = state.params
        batch_stats = {}
        opt_state = {}
        step = state.step

    ckpt = Checkpointer(str(tmp_path / "merged"))
    ckpt.save(1, _WeightsOnly(), wait=True)
    ckpt.close()
    assert Checkpointer(str(tmp_path / "merged")).has_opt_state() is False
