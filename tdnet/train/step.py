"""Jitted train/eval steps (data-parallel under GSPMD).

Training contract (SURVEY.md §3 "Training defaults"; reference: bin/train.py
create_models + parse_args): Adam lr=1e-5 with PER-TENSOR gradient norm
clipping clipnorm=0.001 (Keras `clipnorm` clips each gradient tensor by its
own L2 norm — NOT global-norm clipping; optax has no builtin for this, so
`clip_by_leaf_norm` implements it), loss = smooth_l1(regression) +
focal(classification).

The step fuses, on device, what the reference does on the host per sample
(SURVEY.md §4.1): anchor target assignment (vectorized IoU), both losses,
backward, and the Adam update — one XLA program per shape bucket. Gradients
all-reduce over the 'data' mesh axis automatically (params replicated,
batch sharded; parallel/mesh.py).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from tdnet.ops.anchors import AnchorParameters, anchors_for_shape
from tdnet.ops.losses import focal, smooth_l1
from tdnet.ops.targets import batched_anchor_targets

__all__ = [
    "TrainState",
    "clip_by_leaf_norm",
    "create_optimizer",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def clip_by_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """Keras-style `clipnorm`: clip EACH gradient tensor to max L2 norm."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def create_optimizer(
    learning_rate: float = 1e-5, clipnorm: float = 1e-3
) -> optax.GradientTransformation:
    """Adam(1e-5, clipnorm=0.001) — the reference's compile() settings.

    The Adam lr is injected as a mutable hyperparam so the plateau schedule
    (train/loop.py ReduceLROnPlateau) can lower it without re-jitting."""
    return optax.chain(
        clip_by_leaf_norm(clipnorm),
        optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate),
    )


def create_train_state(
    model,
    rng: jax.Array,
    input_shape: Tuple[int, int, int, int],
    tx: Optional[optax.GradientTransformation] = None,
    freeze_backbone: bool = False,
) -> TrainState:
    """Init variables + optimizer. `freeze_backbone` masks backbone params
    out of the update (reference: --freeze-backbone)."""
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())

    if tx is None:
        tx = create_optimizer()
    if freeze_backbone:
        # optax.masked would pass raw grads through for frozen leaves;
        # multi_transform + set_to_zero actually freezes them.
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen"
            if any(getattr(k, "key", None) == "backbone" for k in path)
            else "trainable",
            params,
        )
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, labels
        )

    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
    )


def make_train_step(
    model,
    num_classes: int,
    anchor_params: Optional[AnchorParameters] = None,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    smooth_l1_sigma: float = 3.0,
    preprocess_mode: str = "caffe",
    fused_stem: Optional[bool] = None,
    mesh=None,
    state_out_shardings=None,
) -> Callable:
    """Build the jittable train step. Anchors are trace-time constants of the
    batch's (bucketed) image shape, so one compilation per bucket.

    uint8 batches (LoaderConfig.device_normalize) are normalized in-graph —
    on TPU via the Pallas ingestion kernel (ops/pallas_ingest.py), written
    directly in the model's compute dtype.

    `fused_stem` (None -> auto: TPU, single device, ResNet backbone,
    caffe/tf mode) runs packed-uint8 batches through the differentiable
    fused ingest+stem Pallas kernel (ops/stem_vjp.fused_stem_train):
    forward fuses normalize+conv+BN+relu+maxpool in one kernel, backward
    rematerializes the XLA reference — same gradients, less HBM traffic.

    `mesh` (the jax.sharding.Mesh of a multi-device run) lets the Pallas
    ingest/stem kernels participate in partitioned graphs via shard_map
    (per-device local-shard invocations; parameter grads psum'd) instead
    of falling back to the plain-jnp normalize.

    `state_out_shardings` (a NamedSharding pytree matching the TrainState)
    PINS the returned state's placement via jit out_shardings — required
    by ZeRO-1 (parallel/zero.py), where the partitioner would otherwise be
    free to emit sharded params instead of keeping the moments sharded and
    the params replicated."""
    focal_fn = focal(alpha=focal_alpha, gamma=focal_gamma, from_logits=True)
    l1_fn = smooth_l1(sigma=smooth_l1_sigma)

    # pallas_call is an opaque custom call to the GSPMD partitioner: in an
    # auto-partitioned multi-device graph it would force the batch-sharded
    # global array to be gathered/replicated. Single device calls the
    # kernels directly; a sharded run with a known `mesh` wraps them in
    # shard_map (per-device local-shard invocations); a sharded run WITHOUT
    # a mesh takes a plain-jnp normalize (same math; XLA shards it like any
    # other elementwise op).
    single_device = jax.device_count() == 1
    if fused_stem is None:
        fused_stem = (
            (single_device or mesh is not None)
            and jax.default_backend() == "tpu"
            and getattr(model, "backbone_name", "").lstrip("se").startswith("resnet")
            and preprocess_mode in ("caffe", "tf")
            and not getattr(model, "stem_input", False)
        )
    stem_model = model.clone(stem_input=True) if fused_stem else None

    def _pallas_ok(images):
        # the Pallas ops are legal single-device, or under shard_map on a
        # 1-D data mesh whose axis divides the batch — never in a plain
        # auto-partitioned multi-device graph (opaque to GSPMD), and never
        # under a 2-D (data, spatial) mesh (parallel/spatial.py): the
        # shard_map wrappers split only the batch axis, so a spatially
        # sharded input would be gathered and recomputed per spatial shard.
        # The jnp fallbacks below are sharded by GSPMD like any other op.
        if single_device:
            return True
        return (
            mesh is not None
            and tuple(mesh.axis_names) == ("data",)
            and images.shape[0] % mesh.size == 0
        )

    def _ingest_mesh_ok(images):
        # the normalize kernel is ELEMENTWISE, so unlike the fused stem its
        # shard_map wrapper also supports the 2-D (data, spatial) mesh
        # (parallel/spatial.py): batch over 'data', packed-row H over
        # 'spatial' — no halo needed. Exact division required (shard_map).
        if single_device:
            return True
        if mesh is None:
            return False
        names = tuple(mesh.axis_names)
        if names == ("data",):
            return images.shape[0] % mesh.size == 0
        if names == ("data", "spatial"):
            return (
                images.ndim == 3
                and images.shape[0] % int(mesh.shape["data"]) == 0
                and images.shape[1] % int(mesh.shape["spatial"]) == 0
            )
        return False

    def _stem_shape_ok(images):
        # the fused-stem kernel supports H % 8 == 0, W % 4 == 0 (every
        # default bucket); anything else must FALL THROUGH to the Pallas
        # normalize + XLA stem path below, which handles any shape —
        # without this guard fused_stem_train raises at trace time
        from tdnet.ops.pallas_stem import supports_shape

        b, h, w3 = images.shape
        return w3 % 3 == 0 and supports_shape((b, h, w3 // 3, 3))

    def loss_fn(params, batch_stats, batch):
        images = batch["images"]
        if (images.dtype == jnp.uint8 and images.ndim == 3 and fused_stem
                and _pallas_ok(images) and _stem_shape_ok(images)):
            # packed (B, H, W*3) rows -> differentiable fused ingest+stem
            # kernel -> model from the pooled activations (stem_input form;
            # conv1/bn1 grads flow through the custom VJP)
            from tdnet.models.resnet import stem_params_from_variables
            from tdnet.ops.stem_vjp import fused_stem_train

            b, h, w3 = images.shape
            k7, inv, off = stem_params_from_variables(
                {"params": params, "batch_stats": batch_stats}
            )
            if getattr(model, "freeze_bn", True):
                # FrozenBatchNorm(frozen=True) stop-gradients scale/bias;
                # stopping the folded inv/off is equivalent (mean/var are
                # non-differentiated batch stats)
                inv = jax.lax.stop_gradient(inv)
                off = jax.lax.stop_gradient(off)
            act = fused_stem_train(
                images, k7, inv, off, normalize=preprocess_mode,
                out_dtype=getattr(model, "dtype", None) or jnp.float32,
                # TDNET_STEM_BWD=remat|kernel picks the gradient path
                # (rematerialized XLA vs the all-Pallas backward kernel;
                # tools/perf_stem_train.py measures both). Default "kernel":
                # measured fastest (batch 16, 800x1344: 82.8 img/s vs 78.9
                # remat); f32-equivalent to remat/XLA incl. the sharded
                # form, and in bf16 it routes the pool gradient on the
                # exact values the Pallas forward pooled (see
                # ops/stem_vjp.py module docstring for the bf16
                # remat-vs-kernel delta).
                backward=os.environ.get("TDNET_STEM_BWD", "kernel"),
                mesh=None if single_device else mesh,
            )
            outputs = stem_model.apply(
                {"params": params, "batch_stats": batch_stats}, act
            )
            return _targets_and_losses(outputs, (h, w3 // 3), batch)
        if images.dtype == jnp.uint8 and images.ndim == 3:
            # packed (B, H, W*3) byte rows (data/prefetch.py packs them —
            # the NHWC uint8 jit-argument layout trap costs 42x physical
            # memory on TPU). Normalized by the Pallas ingest kernel.
            b, h, w3 = images.shape
            if single_device:
                from tdnet.ops.pallas_ingest import normalize_uint8_rows

                images = normalize_uint8_rows(
                    images.reshape(b * h, w3), preprocess_mode,
                    out_dtype=getattr(model, "dtype", None) or jnp.float32,
                ).reshape(b, h, w3 // 3, 3)
            elif _ingest_mesh_ok(images):
                # multi-device with a known mesh (1-D data OR 2-D
                # data×spatial): the rows kernel runs per shard under
                # shard_map (ops/pallas_ingest.py)
                from tdnet.ops.pallas_ingest import \
                    normalize_uint8_packed_sharded

                images = normalize_uint8_packed_sharded(
                    images, preprocess_mode,
                    out_dtype=getattr(model, "dtype", None) or jnp.float32,
                    mesh=mesh,
                )
            else:
                from tdnet.data.image import CAFFE_MEAN_BGR

                out_dtype = getattr(model, "dtype", None) or jnp.float32
                x = images.reshape(b, h, w3 // 3, 3).astype(jnp.float32)
                if preprocess_mode == "caffe":
                    images = (x - jnp.asarray(CAFFE_MEAN_BGR)).astype(out_dtype)
                else:  # tf mode — same multiply form as the Pallas kernel
                    images = ((x - 127.5) * (1.0 / 127.5)).astype(out_dtype)
        elif images.dtype == jnp.uint8:
            from tdnet.data.image import (CAFFE_MEAN_BGR,
                                          preprocess_image_device)

            if single_device:
                images = preprocess_image_device(
                    images, preprocess_mode,
                    out_dtype=getattr(model, "dtype", None),
                )
            else:  # keep pallas_call out of the partitioned graph
                out_dtype = getattr(model, "dtype", None) or jnp.float32
                x = images.astype(jnp.float32)
                if preprocess_mode == "caffe":
                    images = (x - jnp.asarray(CAFFE_MEAN_BGR)).astype(out_dtype)
                else:
                    images = ((x - 127.5) * (1.0 / 127.5)).astype(out_dtype)
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats}, images
        )
        return _targets_and_losses(outputs, images.shape[1:3], batch)

    def _targets_and_losses(outputs, image_hw, batch):
        anchors = jnp.asarray(
            anchors_for_shape(image_hw, anchor_params=anchor_params),
            jnp.float32,
        )
        labels, regression = batched_anchor_targets(
            anchors,
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_mask"],
            batch["image_hw"],
            num_classes,
        )
        cls_loss = focal_fn(labels, outputs["classification"])
        reg_loss = l1_fn(regression, outputs["regression"])
        total = cls_loss + reg_loss
        metrics = {
            "loss": total,
            "classification_loss": cls_loss,
            "regression_loss": reg_loss,
            "num_positive": jnp.sum(labels[..., -1] == 1.0),
        }
        return total, metrics

    # Donating the state buffers halves peak HBM on TPU. On the CPU backend
    # multi-device donated executions intermittently hard-abort — an
    # upstream XLA:CPU issue (donated-buffer reuse races on the virtual
    # 8-device host mesh; not reproducible in a minimal case, not a tdnet
    # bug), so donation is enabled off-CPU only. Semantics are identical;
    # only peak host memory differs.
    donate = () if jax.default_backend() == "cpu" else (0,)

    jit_kwargs = {}
    if state_out_shardings is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(
            jax.tree_util.tree_leaves(state_out_shardings)[0].mesh,
            PartitionSpec())
        # `rep` is a pytree PREFIX for the whole metrics dict — every
        # metric replicated without enumerating keys (adding a metric to
        # _targets_and_losses must not break the ZeRO path).
        jit_kwargs["out_shardings"] = (state_out_shardings, rep)

    @functools.partial(jax.jit, donate_argnums=donate, **jit_kwargs)
    def train_step(state: TrainState, batch: dict):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, state.batch_stats, batch)
        # pre-clip global gradient norm: the observability guard for the
        # measured Adam second-moment blow-up (round-3 epoch-217 finding,
        # tools/convergence_run.py) — a user watching metrics.jsonl sees
        # the spike building before the step that diverges
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model) -> Callable:
    """Forward-only step returning raw model outputs (fp32 logits)."""

    @jax.jit
    def eval_step(params, batch_stats, images):
        return model.apply({"params": params, "batch_stats": batch_stats}, images)

    return eval_step
