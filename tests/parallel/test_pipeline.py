"""Pipeline parallelism (parallel/pipeline.py): the 2-stage GPipe split
must be numerically equivalent to the single-device model, and the stage
states must actually live on their own devices (that partition is the
memory the mode exists to divide).

The reference has no pipeline parallelism (SURVEY.md §2.4). Runs on the
virtual 8-device CPU mesh (tests/conftest.py); the schedule/transfer
logic is backend-agnostic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tdnet.models.retinanet import RetinaNet
from tdnet.ops.anchors import anchors_for_shape
from tdnet.ops.losses import focal, smooth_l1
from tdnet.ops.targets import batched_anchor_targets
from tdnet.parallel.pipeline import (PipelinedForward, PipelineTrainer,
                                     _stage_vars, make_stage_modules,
                                     split_variables)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs >= 2 devices")

HW = (64, 64)


def _model():
    return RetinaNet(num_classes=2, dtype=jnp.float32)


def _variables(model):
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3), jnp.float32))


def _images(b):
    return np.random.RandomState(1).uniform(
        -100, 100, (b, *HW, 3)).astype(np.float32)


def _batch(b):
    rs = np.random.RandomState(2)
    boxes = np.zeros((b, 2, 4), np.float32)
    for i in range(b):
        x1, y1 = rs.randint(0, 24, 2)
        boxes[i, 0] = [x1, y1, x1 + 24, y1 + 20]
        boxes[i, 1] = [4, 30, 40, 60]
    return {
        "images": _images(b),
        "gt_boxes": boxes,
        "gt_labels": rs.randint(0, 2, (b, 2)).astype(np.int32),
        "gt_mask": np.ones((b, 2), np.float32),
        "image_hw": np.tile(np.asarray(HW, np.float32), (b, 1)),
    }


def test_split_partition_and_merge():
    model = _model()
    variables = _variables(model)
    v0, v1 = split_variables(variables)
    assert set(v0["params"]) == {"backbone"}
    assert set(v1["params"]) == {
        "fpn", "regression_submodel", "classification_submodel"}
    # disjoint + union == original
    merged = dict(v1["params"])
    merged.update(v0["params"])
    assert jax.tree_util.tree_structure(
        dict(variables["params"])) == jax.tree_util.tree_structure(merged)


def test_stage_composition_bit_identical():
    model = _model()
    variables = _variables(model)
    backbone, head = make_stage_modules(model)
    v0, v1 = split_variables(variables)
    x = jnp.asarray(_images(2))
    taps = backbone.apply(_stage_vars(v0), x)
    staged = head.apply({"params": v1["params"]}, *taps)
    full = model.apply(variables, x)
    for k in full:
        np.testing.assert_array_equal(np.asarray(staged[k]),
                                      np.asarray(full[k]))


def test_pipelined_forward_matches_full_model():
    model = _model()
    variables = _variables(model)
    pf = PipelinedForward(model, variables, jax.devices()[:2],
                          microbatch_size=2)
    images = _images(4)
    out = pf(images)
    full = model.apply(variables, jnp.asarray(images))
    for k in full:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(full[k]),
                                   rtol=1e-5, atol=1e-5)
    # outputs live on the stage-1 device
    assert list(out["classification"].devices()) == [jax.devices()[1]]


def _reference_accum_step(model, variables, batch, num_microbatches, lr):
    """Single-device gradient accumulation with the full model — the
    semantics PipelineTrainer documents (mean of per-microbatch losses,
    per-microbatch focal normalization), SGD(lr)."""
    focal_fn = focal(alpha=0.25, gamma=2.0, from_logits=True)
    l1_fn = smooth_l1(sigma=3.0)
    anchors = jnp.asarray(anchors_for_shape(HW), jnp.float32)

    batch_stats = variables.get("batch_stats", {})

    def loss_fn(params, mb):
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats}, mb["images"])
        labels, regression = batched_anchor_targets(
            anchors, mb["gt_boxes"], mb["gt_labels"], mb["gt_mask"],
            mb["image_hw"], model.num_classes)
        return (focal_fn(labels, outputs["classification"])
                + l1_fn(regression, outputs["regression"]))

    n = batch["images"].shape[0]
    mb = n // num_microbatches
    params = variables["params"]
    acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    losses = []
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for k in range(num_microbatches):
        sl = slice(k * mb, (k + 1) * mb)
        mb_batch = {key: jnp.asarray(v[sl]) for key, v in batch.items()}
        loss, g = grad_fn(params, mb_batch)
        losses.append(float(loss))
        acc = jax.tree_util.tree_map(jnp.add, acc, g)
    grads = jax.tree_util.tree_map(
        lambda g: g / num_microbatches, acc)
    new_params = jax.tree_util.tree_map(
        lambda p, g: p - lr * g, params, grads)
    return new_params, float(np.mean(losses))


def test_train_step_matches_grad_accumulation():
    model = _model()
    variables = _variables(model)
    batch = _batch(4)
    lr = 0.1
    trainer = PipelineTrainer(
        model, num_classes=2, devices=jax.devices()[:2],
        tx_factory=lambda: optax.sgd(lr))
    states = trainer.states_from_variables(variables)
    states, metrics = trainer.step(states, batch, num_microbatches=2)
    ref_params, ref_loss = _reference_accum_step(
        model, variables, batch, num_microbatches=2, lr=lr)

    assert metrics["num_positive"] > 0
    assert np.isfinite(metrics["loss"])
    np.testing.assert_allclose(metrics["loss"], ref_loss, rtol=1e-5)

    from flax.core import unfreeze
    from flax.traverse_util import flatten_dict

    merged = trainer.merged_variables(states)["params"]
    flat_got = flatten_dict(unfreeze(merged))
    flat_ref = flatten_dict(unfreeze(ref_params))
    flat_orig = flatten_dict(unfreeze(variables["params"]))
    assert set(flat_got) == set(flat_ref) == set(flat_orig)
    # SGD(lr) makes new_params = params - lr * mean_grad, so the implied
    # per-leaf gradient is (orig - new) / lr. The pipeline gradient and the
    # single-device full-model gradient are the same graph split by the
    # chain rule at the taps — equal up to XLA reassociation (the two
    # backwards fuse/reduce in different orders), so compare per-leaf
    # relative Frobenius norm, not elementwise rtol (near-zero elements
    # have unbounded relative error).
    # Tolerance note (measured, /tmp-diagnosed during round 3): the
    # pipeline's backbone program and the monolithic reference compile to
    # different XLA programs, so the taps differ by f32 reassociation
    # (~1e-6 rel). The LOSS matches to ~1e-7, but gradients are CHAOTIC to
    # that perturbation: a 4e-4-absolute tap wiggle flips ReLU activation
    # states in the subnet towers, and each flip moves a gradient
    # contribution discontinuously — measured ~6e-3 rel-Frobenius on the
    # classification tower kernels while the per-stage backwards agree to
    # 3e-7 at IDENTICAL taps (test_stage_backwards_exact below is the
    # rigorous gradient-correctness test). 2e-2 here still catches every
    # semantic error (sign, normalization, missed microbatch — all O(1)).
    saw_nonzero = False
    for path, leaf in flat_got.items():
        orig = np.asarray(flat_orig[path], np.float64)
        g_got = (orig - np.asarray(leaf, np.float64)) / lr
        g_ref = (orig - np.asarray(flat_ref[path], np.float64)) / lr
        ref_norm = np.linalg.norm(g_ref)
        if ref_norm > 0:
            saw_nonzero = True
        diff = np.linalg.norm(g_got - g_ref)
        assert diff < max(2e-2 * ref_norm, 1e-5), (
            f"{'/'.join(path)}: |dg|={diff:.2e} (|g_ref|={ref_norm:.3e})")
    assert saw_nonzero


def test_stage_backwards_exact():
    """The rigorous gradient test: at IDENTICAL stage inputs, the
    pipeline's per-stage backward programs must match independent
    single-program jax.grad computations to float tolerance (~1e-5 rel).
    This pins b1 (head forward+backward) and b0 (rematerialized backbone
    VJP) individually — the end-to-end comparison above is loose only
    because of ReLU-boundary chaos under tap reassociation."""
    model = _model()
    variables = _variables(model)
    batch = _batch(2)
    trainer = PipelineTrainer(model, num_classes=2, devices=jax.devices()[:2])
    s0, s1 = trainer.states_from_variables(variables)
    d0, d1 = trainer.devices

    x = jax.device_put(jnp.asarray(batch["images"]), d0)
    taps = trainer._f0(s0.params, s0.batch_stats, x)
    taps1 = jax.device_put(taps, d1)
    anchors = jax.device_put(
        jnp.asarray(anchors_for_shape(HW), jnp.float32), d1)
    tgt = jax.device_put(
        {k: jnp.asarray(batch[k])
         for k in ("gt_boxes", "gt_labels", "gt_mask", "image_hw")}, d1)
    dp1, dtaps, _ = trainer._b1(
        s1.params, s1.batch_stats, taps1, tgt, anchors,
        trainer._zeros(s1.params))

    backbone, head = make_stage_modules(model)
    focal_fn = focal(0.25, 2.0, from_logits=True)
    l1_fn = smooth_l1(3.0)
    taps_host = tuple(jnp.asarray(t) for t in jax.device_get(taps))

    def head_loss(p1, taps_):
        outputs = head.apply({"params": p1}, *taps_)
        labels, regression = batched_anchor_targets(
            jnp.asarray(anchors_for_shape(HW), jnp.float32),
            jnp.asarray(batch["gt_boxes"]), jnp.asarray(batch["gt_labels"]),
            jnp.asarray(batch["gt_mask"]), jnp.asarray(batch["image_hw"]), 2)
        return (focal_fn(labels, outputs["classification"])
                + l1_fn(regression, outputs["regression"]))

    v0, v1 = split_variables(variables)
    g_head, g_taps = jax.jit(jax.grad(head_loss, argnums=(0, 1)))(
        v1["params"], taps_host)

    def rel(a, b):
        a = np.asarray(jax.device_get(a), np.float64)
        b = np.asarray(jax.device_get(b), np.float64)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)

    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(dp1)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(g_head))):
        assert rel(la, lb) < 1e-5, jax.tree_util.keystr(pa)
    for a, b in zip(jax.device_get(dtaps), g_taps):
        assert rel(a, b) < 1e-5

    # b0: rematerialized backbone VJP vs an independent vjp AT THE SAME
    # cotangent (use the independent g_taps so both sides see identical
    # inputs)
    dtaps0 = jax.device_put(tuple(jnp.asarray(np.asarray(t)) for t in
                                  jax.device_get(g_taps)), d0)
    dp0 = trainer._b0(s0.params, s0.batch_stats, x, dtaps0,
                      trainer._zeros(s0.params))

    sv0 = _stage_vars(v0)

    def bb_apply(p0):
        return backbone.apply(
            {"params": p0, "batch_stats": sv0["batch_stats"]},
            jnp.asarray(batch["images"]))

    _, vjp = jax.vjp(bb_apply, sv0["params"])
    (g_bb,) = vjp(tuple(jnp.asarray(np.asarray(t)) for t in
                        jax.device_get(g_taps)))
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(dp0)),
            jax.tree_util.tree_leaves_with_path(g_bb)):
        assert rel(la, lb) < 1e-5, jax.tree_util.keystr(pa)


def test_stage_states_partitioned_across_devices():
    model = _model()
    trainer = PipelineTrainer(model, num_classes=2, devices=jax.devices()[:2])
    s0, s1 = trainer.init_states(jax.random.PRNGKey(0), (1, *HW, 3))
    d0, d1 = jax.devices()[:2]
    for leaf in jax.tree_util.tree_leaves(s0.params):
        assert list(leaf.devices()) == [d0]
    for leaf in jax.tree_util.tree_leaves(s1.params):
        assert list(leaf.devices()) == [d1]
    # Adam moments shard with their params (the memory split that matters)
    for leaf in jax.tree_util.tree_leaves(s1.opt_state):
        if hasattr(leaf, "devices"):
            assert list(leaf.devices()) == [d1]


def test_step_then_merge_loads_into_full_model():
    model = _model()
    variables = _variables(model)
    trainer = PipelineTrainer(model, num_classes=2, devices=jax.devices()[:2])
    states = trainer.states_from_variables(variables)
    states, _ = trainer.step(states, _batch(2), num_microbatches=2)
    merged = trainer.merged_variables(states)
    out = model.apply(merged, jnp.asarray(_images(1)))
    assert np.all(np.isfinite(np.asarray(out["regression"])))
