"""Pipeline (inter-layer) parallelism: GPipe-style 2-stage RetinaNet.

The reference has no pipeline parallelism (SURVEY.md §2.4 — its whole
inventory is `multi_gpu_model` data parallelism); this module is part of
tdnet's beyond-parity parallelism program (data -> parallel/mesh.py,
spatial -> parallel/spatial.py, tensor -> parallel/tensor.py, pipeline ->
here).

Design — TPU-first, not a torch-style RPC pipeline:

- **Stage split at the architecture's natural seam**: stage 0 is the
  backbone (images -> C3/C4/C5 taps), stage 1 is FPN + the shared subnets
  (+ target assignment and losses for training). Each stage's parameters
  AND Adam moments live only on that stage's device — per-chip
  weight+optimizer memory divides by the number of stages, which is the
  memory pipeline parallelism exists to divide. (A deeper split inside
  the backbone is possible — every ResNet stage boundary is a seam — but
  for a detector whose heads are ~45% of the FLOPs the 2-stage split is
  the one with balanced halves; see PERF.md per-op table.)
- **Each stage is one jitted XLA program**; microbatches flow through a
  1F1B Python schedule. JAX's async dispatch IS the pipeline engine:
  every per-device op queue is FIFO, so enqueueing stage-0 forward of
  microbatch k+1 BEFORE stage-0 backward of microbatch k keeps device 0
  busy while device 1 runs microbatch k's stage-1 program. Inter-stage
  activations/cotangents move by `jax.device_put` (ICI on a real TPU
  slice).
- **Backward is rematerialized per stage** (GPipe-with-remat): each
  backward program recomputes its own stage's forward from the saved
  stage INPUT and applies the VJP in the same XLA program — only stage
  inputs are kept across the schedule, no activation stash, so pipeline
  depth does not multiply activation memory.
- **Gradient-accumulation semantics**: with n microbatches the step
  optimizes mean_k loss(microbatch_k). Per-batch loss normalization
  (focal's max(1, #positive)) is computed per MICROBATCH — identical to
  single-device gradient accumulation at the same microbatch size (the
  equivalence the tests assert bit-for-bit), and equal to the full-batch
  step only when num_microbatches == 1.

Composition note: pipeline is currently an alternative to the
data/spatial/tensor meshes, not composable with them in one run — the
stage programs are plain single-device jits. Composing pp x dp (a mesh
per stage) is a mechanical extension (shard each stage's jit over its own
data mesh); it is out of scope until a >1-host pipeline target exists.

Input contract: f32/bf16 NHWC images (the packed-uint8 / fused-stem
ingestion paths are single-device or data-mesh features — normalize
upstream, e.g. via data/prefetch.py's f32 path).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.core import FrozenDict

from tdnet.models.retinanet import apply_retinanet_tail, _build_backbone
from tdnet.ops.anchors import AnchorParameters, anchors_for_shape
from tdnet.ops.losses import focal, smooth_l1
from tdnet.ops.targets import batched_anchor_targets
from tdnet.train.step import TrainState, create_optimizer

__all__ = [
    "STAGE0_KEYS",
    "split_variables",
    "make_stage_modules",
    "PipelinedForward",
    "PipelineTrainer",
]

# Variable-tree keys owned by stage 0; everything else is stage 1. Matches
# RetinaNet.__call__'s module names (models/retinanet.py).
STAGE0_KEYS = ("backbone",)


def _split_tree(tree) -> Tuple[Dict, Dict]:
    t0 = {k: v for k, v in tree.items() if k in STAGE0_KEYS}
    t1 = {k: v for k, v in tree.items() if k not in STAGE0_KEYS}
    return t0, t1


def split_variables(variables) -> Tuple[Dict, Dict]:
    """Split a full RetinaNet variables dict into per-stage variables.

    Returns (vars0, vars1), each a {'params': ..., 'batch_stats': ...}
    dict restricted to that stage's modules. The union reconstructs the
    original tree exactly (asserted by tests)."""
    p0, p1 = _split_tree(dict(variables["params"]))
    bs = dict(variables.get("batch_stats", {}))
    b0, b1 = _split_tree(bs)
    return (
        {"params": p0, "batch_stats": b0},
        {"params": p1, "batch_stats": b1},
    )


class _HeadStage(nn.Module):
    """Stage 1: FPN + shared subnets from backbone taps.

    Delegates to models.retinanet.apply_retinanet_tail — the SAME function
    RetinaNet.__call__ runs after its backbone, so the two cannot
    desynchronize (tests/parallel/test_pipeline.py additionally pins
    bit-identical composition). Module names match RetinaNet's children so
    the stage's param tree IS the corresponding subtree of the full
    model's."""

    num_classes: int
    num_anchors: int = 9
    feature_size: int = 256
    prior_probability: float = 0.01
    dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5) -> Dict[str, jnp.ndarray]:
        return apply_retinanet_tail(
            c3, c4, c5,
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            feature_size=self.feature_size,
            prior_probability=self.prior_probability,
            dtype=self.dtype,
            output_dtype=self.output_dtype,
        )


def make_stage_modules(model) -> Tuple[nn.Module, nn.Module]:
    """(backbone_module, head_module) for a RetinaNet instance.

    The backbone module applied standalone consumes exactly
    variables['params']['backbone'] (flax drops the child name at the
    root), and the head stage consumes the complementary subtree."""
    backbone = _build_backbone(
        model.backbone_name, model.dtype, model.freeze_bn,
        getattr(model, "stem_input", False),
    )
    head = _HeadStage(
        num_classes=model.num_classes,
        num_anchors=model.num_anchors,
        feature_size=model.feature_size,
        prior_probability=model.prior_probability,
        dtype=model.dtype,
        output_dtype=model.output_dtype,
    )
    return backbone, head


def _stage_vars(v):
    # standalone child apply: strip the single child name if present
    params = v["params"]
    if tuple(params.keys()) == ("backbone",):
        bs = v.get("batch_stats", {})
        return {
            "params": params["backbone"],
            "batch_stats": bs.get("backbone", FrozenDict()),
        }
    return {"params": params, "batch_stats": v.get("batch_stats", FrozenDict())}


class PipelinedForward:
    """Microbatched 2-stage pipelined inference over two devices.

    forward(images) returns the same {'regression', 'classification'} as
    RetinaNet.apply on the full batch (concatenated over microbatches,
    resident on the stage-1 device)."""

    def __init__(self, model, variables, devices: Sequence[Any],
                 microbatch_size: int = 1, max_in_flight: int = 2):
        if len(devices) != 2:
            raise ValueError(f"2-stage pipeline needs 2 devices, got {len(devices)}")
        if max_in_flight < 1:
            raise ValueError(f"max_in_flight must be >= 1, got {max_in_flight}")
        self.devices = tuple(devices)
        self.microbatch_size = int(microbatch_size)
        # bound on microbatch TAPS stashed on the stage-1 device at once:
        # an unbounded stash (enqueue all forwards, then all heads) would
        # grow device-1 memory linearly in batch/microbatch count,
        # defeating the pipeline's memory story (round-3 weak #1). 2 keeps
        # the stages overlapped (device 0 runs f0(k+1) while device 1 runs
        # f1(k)) at constant memory.
        self.max_in_flight = int(max_in_flight)
        backbone, head = make_stage_modules(model)
        v0, v1 = split_variables(variables)
        self.v0 = jax.device_put(_stage_vars(v0), self.devices[0])
        self.v1 = jax.device_put(_stage_vars(v1), self.devices[1])

        self._f0 = jax.jit(lambda v, x: backbone.apply(v, x))
        self._f1 = jax.jit(lambda v, taps: head.apply(v, *taps))

    def __call__(self, images) -> Dict[str, jnp.ndarray]:
        from collections import deque

        n = images.shape[0]
        mb = self.microbatch_size
        if n % mb != 0:
            raise ValueError(f"batch {n} not divisible by microbatch {mb}")
        outs = []
        pending: deque = deque()
        for k in range(n // mb):
            x = jax.device_put(np.asarray(images[k * mb:(k + 1) * mb]),
                               self.devices[0])
            taps = self._f0(self.v0, x)
            pending.append(jax.device_put(taps, self.devices[1]))
            if len(pending) >= self.max_in_flight:
                outs.append(self._f1(self.v1, pending.popleft()))
        while pending:
            outs.append(self._f1(self.v1, pending.popleft()))
        return {
            k: jnp.concatenate([o[k] for o in outs], axis=0)
            for k in outs[0]
        }


class PipelineTrainer:
    """GPipe train step over two devices (stage state partitioned).

    Usage:
        trainer = PipelineTrainer(model, num_classes, devices)
        s0, s1 = trainer.init_states(rng, (mb, H, W, 3))
        (s0, s1), metrics = trainer.step((s0, s1), batch, num_microbatches)

    Each stage's TrainState (params, Adam moments) lives on its own device
    for the whole run; step() never materializes the full model anywhere.
    """

    def __init__(
        self,
        model,
        num_classes: int,
        devices: Sequence[Any],
        anchor_params: Optional[AnchorParameters] = None,
        focal_alpha: float = 0.25,
        focal_gamma: float = 2.0,
        smooth_l1_sigma: float = 3.0,
        tx_factory: Optional[Callable[[], optax.GradientTransformation]] = None,
    ):
        if len(devices) != 2:
            raise ValueError(f"2-stage pipeline needs 2 devices, got {len(devices)}")
        self.model = model
        self.devices = tuple(devices)
        self.anchor_params = anchor_params
        self._tx_factory = tx_factory or create_optimizer
        self.backbone, self.head = make_stage_modules(model)
        focal_fn = focal(alpha=focal_alpha, gamma=focal_gamma, from_logits=True)
        l1_fn = smooth_l1(sigma=smooth_l1_sigma)

        backbone, head = self.backbone, self.head

        def f0(params, batch_stats, x):
            return backbone.apply(
                {"params": params, "batch_stats": batch_stats}, x)

        # stage-1 forward+backward in ONE program: loss over the head from
        # the taps, grads wrt (head params, taps); accumulates into acc.
        def b1(params, batch_stats, taps, tgt, anchors, acc):
            def loss_of(p, taps_):
                outputs = head.apply(
                    {"params": p, "batch_stats": batch_stats}, *taps_)
                labels, regression = batched_anchor_targets(
                    anchors, tgt["gt_boxes"], tgt["gt_labels"],
                    tgt["gt_mask"], tgt["image_hw"], num_classes)
                cls_loss = focal_fn(labels, outputs["classification"])
                reg_loss = l1_fn(regression, outputs["regression"])
                total = cls_loss + reg_loss
                return total, {
                    "loss": total,
                    "classification_loss": cls_loss,
                    "regression_loss": reg_loss,
                    "num_positive": jnp.sum(labels[..., -1] == 1.0),
                }

            (_, metrics), (dp, dtaps) = jax.value_and_grad(
                loss_of, argnums=(0, 1), has_aux=True)(params, taps)
            acc = jax.tree_util.tree_map(jnp.add, acc, dp)
            return acc, dtaps, metrics

        # stage-0 backward: REMATERIALIZE the backbone forward from the
        # saved stage input, VJP with the taps cotangent, accumulate.
        def b0(params, batch_stats, x, dtaps, acc):
            _, vjp = jax.vjp(lambda p: f0(p, batch_stats, x), params)
            (dp,) = vjp(dtaps)
            return jax.tree_util.tree_map(jnp.add, acc, dp)

        def update(state: TrainState, acc, inv_n):
            grads = jax.tree_util.tree_map(lambda g: g * inv_n, acc)
            return state.apply_gradients(grads)

        self._f0 = jax.jit(f0)
        self._b1 = jax.jit(b1)
        self._b0 = jax.jit(b0)
        self._update = jax.jit(update)
        self._zeros = jax.jit(
            lambda p: jax.tree_util.tree_map(jnp.zeros_like, p))

    def init_states(self, rng, input_shape) -> Tuple[TrainState, TrainState]:
        """Per-stage TrainStates, placed on their devices. The full model
        is initialized once ON HOST then split — init shapes match the
        non-pipelined model exactly (same checkpoint compatibility)."""
        variables = self.model.init(rng, jnp.zeros(input_shape, jnp.float32))
        return self.states_from_variables(variables)

    def states_from_variables(self, variables) -> Tuple[TrainState, TrainState]:
        v0, v1 = split_variables(variables)
        states = []
        for v, dev in zip((_stage_vars(v0), _stage_vars(v1)), self.devices):
            tx = self._tx_factory()
            params = jax.device_put(v["params"], dev)
            # device_put the whole opt state: jit constants that are not
            # derived from params (Adam count, injected learning_rate)
            # otherwise land on the DEFAULT device, not the stage device
            opt_state = jax.device_put(jax.jit(tx.init)(params), dev)
            states.append(TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=jax.device_put(v["batch_stats"], dev),
                opt_state=opt_state,
                tx=tx,
            ))
        return tuple(states)

    def merged_variables(self, states) -> Dict:
        """Reassemble the full-model variables dict (host) — for
        checkpointing / evaluation with the ordinary Predictor."""
        s0, s1 = states
        params = dict(jax.device_get(s1.params))
        params["backbone"] = jax.device_get(s0.params)
        bs = dict(jax.device_get(s1.batch_stats))
        bs0 = jax.device_get(s0.batch_stats)
        if bs0:
            bs["backbone"] = bs0
        return {"params": params, "batch_stats": bs}

    def step(self, states, batch: Dict[str, np.ndarray],
             num_microbatches: int):
        """One optimizer step = mean gradient over num_microbatches
        microbatches, 1F1B schedule (see module docstring)."""
        s0, s1 = states
        d0, d1 = self.devices
        if num_microbatches < 1:
            raise ValueError(
                f"num_microbatches must be >= 1, got {num_microbatches}")
        images = np.asarray(batch["images"])
        n = images.shape[0]
        if n % num_microbatches != 0:
            raise ValueError(
                f"batch {n} not divisible into {num_microbatches} microbatches")
        mb = n // num_microbatches
        hw = images.shape[1:3]
        anchors = jax.device_put(
            jnp.asarray(
                anchors_for_shape(hw, anchor_params=self.anchor_params),
                jnp.float32),
            d1)

        def mb_slice(k):
            sl = slice(k * mb, (k + 1) * mb)
            x = jax.device_put(images[sl], d0)
            tgt = jax.device_put(
                {"gt_boxes": np.asarray(batch["gt_boxes"])[sl],
                 "gt_labels": np.asarray(batch["gt_labels"])[sl],
                 "gt_mask": np.asarray(batch["gt_mask"])[sl],
                 "image_hw": np.asarray(batch["image_hw"])[sl]},
                d1)
            return x, tgt

        acc0 = self._zeros(s0.params)
        acc1 = self._zeros(s1.params)
        metrics_acc = []

        # 1F1B: enqueue stage-0 forward of microbatch k+1 BEFORE stage-0
        # backward of microbatch k — device 0's FIFO queue then overlaps
        # f0(k+1) with device 1's b1(k).
        x0, tgt0 = mb_slice(0)
        taps = self._f0(s0.params, s0.batch_stats, x0)
        pending = (x0, jax.device_put(taps, d1), tgt0)
        for k in range(1, num_microbatches + 1):
            if k < num_microbatches:
                xk, tgtk = mb_slice(k)
                taps_k = self._f0(s0.params, s0.batch_stats, xk)
            x_prev, taps_prev, tgt_prev = pending
            acc1, dtaps, metrics = self._b1(
                s1.params, s1.batch_stats, taps_prev, tgt_prev, anchors, acc1)
            acc0 = self._b0(
                s0.params, s0.batch_stats, x_prev,
                jax.device_put(dtaps, d0), acc0)
            metrics_acc.append(metrics)
            if k < num_microbatches:
                pending = (xk, jax.device_put(taps_k, d1), tgtk)

        inv_n = 1.0 / float(num_microbatches)
        new_s0 = self._update(s0, acc0, inv_n)
        new_s1 = self._update(s1, acc1, inv_n)
        metrics_acc = jax.device_get(metrics_acc)
        out = {
            "loss": float(np.mean([m["loss"] for m in metrics_acc])),
            "classification_loss": float(
                np.mean([m["classification_loss"] for m in metrics_acc])),
            "regression_loss": float(
                np.mean([m["regression_loss"] for m in metrics_acc])),
            "num_positive": int(
                np.sum([m["num_positive"] for m in metrics_acc])),
        }
        return (new_s0, new_s1), out
