"""ZeRO-1 (parallel/zero.py): Adam moments sharded over the data axis must
give the EXACT plain-DP step (same graph, different placement), and the
partition must survive the update with params still replicated — the pin
that distinguishes ZeRO-1 from letting the partitioner drift to sharded
params.

The reference has no ZeRO/FSDP (SURVEY.md §2.4). Runs on the virtual
8-device CPU mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tdnet.models.retinanet import RetinaNet
from tdnet.parallel.mesh import (batch_sharding, create_mesh,
                                 replicated_sharding)
from tdnet.parallel.zero import (moment_partition_spec, shard_state_zero,
                                 zero_state_shardings)
from tdnet.train.step import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device mesh")

HW = (64, 64)


def _model():
    return RetinaNet(num_classes=1, dtype=jnp.float32)


def _state(model):
    return create_train_state(model, jax.random.PRNGKey(0), (1, *HW, 3))


def _batch(b):
    rs = np.random.RandomState(3)
    return {
        "images": rs.uniform(-100, 100, (b, *HW, 3)).astype(np.float32),
        "gt_boxes": np.tile(
            np.array([[[8.0, 8.0, 40.0, 32.0]]], np.float32), (b, 1, 1)),
        "gt_labels": np.zeros((b, 1), np.int32),
        "gt_mask": np.ones((b, 1), np.float32),
        "image_hw": np.tile(np.asarray(HW, np.float32), (b, 1)),
    }


def test_shard_rule():
    mesh = create_mesh()
    model = _model()
    state = _state(model)
    shardings = zero_state_shardings(state, mesh)
    flat_state = jax.tree_util.tree_leaves_with_path(state)
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(shardings))
    n_sharded = 0
    for path, leaf in flat_state:
        spec = flat_sh[path].spec
        names = [getattr(e, "key", getattr(e, "name", None)) for e in path]
        in_moments = any(n in ("mu", "nu") for n in names)
        if not in_moments:
            # params / batch_stats / step / counts: replicated, always
            assert spec == P(), jax.tree_util.keystr(path)
        elif spec != P():
            assert spec[-1] == "data"
            assert leaf.shape[-1] % 8 == 0 and leaf.shape[-1] >= 64
            n_sharded += 1
    assert n_sharded > 50  # the moment tree really is sharded, not a no-op


def test_zero_step_matches_plain_dp():
    mesh = create_mesh()
    model = _model()
    batch = jax.device_put(_batch(8), batch_sharding(mesh))

    plain_state = jax.device_put(_state(model), replicated_sharding(mesh))
    plain_step = make_train_step(model, num_classes=1, fused_stem=False)
    plain_new, plain_m = jax.block_until_ready(plain_step(plain_state, batch))

    zero_state = shard_state_zero(_state(model), mesh)
    zero_step = make_train_step(
        model, num_classes=1, fused_stem=False,
        state_out_shardings=zero_state_shardings(zero_state, mesh))
    zero_new, zero_m = jax.block_until_ready(zero_step(zero_state, batch))

    np.testing.assert_allclose(
        float(jax.device_get(zero_m["loss"])),
        float(jax.device_get(plain_m["loss"])), rtol=1e-6)
    flat_plain = dict(jax.tree_util.tree_leaves_with_path(plain_new.params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(zero_new.params):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(leaf)),
            np.asarray(jax.device_get(flat_plain[path])),
            rtol=1e-6, atol=1e-7, err_msg=jax.tree_util.keystr(path))


def test_partition_survives_update_params_stay_replicated():
    mesh = create_mesh()
    model = _model()
    zero_state = shard_state_zero(_state(model), mesh)
    step = make_train_step(
        model, num_classes=1, fused_stem=False,
        state_out_shardings=zero_state_shardings(zero_state, mesh))
    batch = jax.device_put(_batch(8), batch_sharding(mesh))
    new_state, _ = jax.block_until_ready(step(zero_state, batch))

    # params replicated after the step
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert leaf.sharding.is_fully_replicated

    # moments still sharded: find a conv-kernel mu leaf and check its
    # per-device shard is 1/8 of the full last dim
    def moments(opt_state):
        found = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(opt_state):
            names = [getattr(e, "key", getattr(e, "name", None))
                     for e in path]
            if any(n in ("mu", "nu") for n in names) and (
                    getattr(leaf, "ndim", 0) >= 2 and leaf.shape[-1] >= 64):
                found.append(leaf)
        return found

    sharded = moments(new_state.opt_state)
    assert sharded
    for leaf in sharded:
        assert not leaf.sharding.is_fully_replicated
        assert (leaf.sharding.shard_shape(leaf.shape)[-1]
                == leaf.shape[-1] // 8)

    # and a second step from the pinned output works (steady state)
    new_state2, m2 = jax.block_until_ready(step(new_state, batch))
    assert np.isfinite(float(jax.device_get(m2["loss"])))
