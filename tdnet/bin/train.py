"""Training CLI (reference: keras_retinanet/bin/train.py ~L1-530).

    python -m tdnet.bin.train [options] csv annotations.csv classes.csv

Defaults mirror the reference's parse_args: Adam lr=1e-5 clipnorm=1e-3,
batch-size 1, 10000 steps/epoch, 50 epochs, per-epoch snapshots and
optional per-epoch mAP evaluation, ReduceLROnPlateau(loss, 0.1, patience 2).

TPU-native differences: shape-bucketed static batches, on-device target
assignment, orbax snapshots (a directory, not .h5), pjit data parallelism
over all visible devices (--devices to restrict), optional profiler trace.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp

from tdnet.bin._common import add_dataset_args, anchor_params_from_args, make_dataset
from tdnet.data.generator import BatchLoader, LoaderConfig
from tdnet.data.prefetch import prefetch_to_device
from tdnet.models import backbone as backbone_registry
from tdnet.models.io import save_model
from tdnet.parallel.mesh import batch_sharding, create_mesh, replicated_sharding
from tdnet.train.checkpoint import Checkpointer
from tdnet.train.loop import ReduceLROnPlateau, fit
from tdnet.train.predictor import Predictor
from tdnet.train.step import create_optimizer, create_train_state, make_train_step
from tdnet.utils.eval import evaluate


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train a tdnet RetinaNet (TPU-native)."
    )
    add_dataset_args(parser)

    parser.add_argument("--backbone", default="resnet50", type=str)
    parser.add_argument("--batch-size", default=1, type=int)
    parser.add_argument("--lr", default=1e-5, type=float)
    parser.add_argument("--clipnorm", default=1e-3, type=float)
    parser.add_argument("--epochs", default=50, type=int)
    parser.add_argument("--steps", default=10000, type=int, help="steps per epoch")
    parser.add_argument("--snapshot-path", default="./snapshots", type=str)
    parser.add_argument("--snapshot", default=None, type=str,
                        help="resume from a snapshot directory")
    parser.add_argument("--model-path", default=None, type=str,
                        help="write a deployable .tdn at the end")
    parser.add_argument("--no-snapshots", dest="snapshots", action="store_false")
    parser.add_argument("--freeze-backbone", action="store_true")
    parser.add_argument("--random-transform", action="store_true")
    parser.add_argument("--config", default=None, type=str,
                        help="anchor parameters INI (reference-compatible)")
    parser.add_argument("--image-min-side", default=800, type=int)
    parser.add_argument("--image-max-side", default=1333, type=int)
    parser.add_argument("--max-boxes", default=64, type=int)
    parser.add_argument("--evaluation", dest="evaluation", action="store_true",
                        help="run mAP evaluation each epoch (needs --val-annotations)")
    parser.add_argument("--score-threshold", default=0.05, type=float)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (recommended on TPU)")
    parser.add_argument("--device-normalize", action="store_true",
                        help="ship uint8 batches; normalization fuses into the graph")
    parser.add_argument("--log-every", default=50, type=int)
    parser.add_argument("--metrics-path", default=None, type=str)
    parser.add_argument("--tensorboard-dir", default=None, type=str,
                        help="write TensorBoard scalars (reference: --tensorboard-dir)")
    parser.add_argument("--profile-dir", default=None, type=str,
                        help="capture a jax profiler trace of epoch 2")
    parser.add_argument("--nan-check", action="store_true",
                        help="enable jax_debug_nans (SURVEY.md §6 sanitizer analog)")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.nan_check:
        jax.config.update("jax_debug_nans", True)

    train_ds = make_dataset(args, "train")
    val_ds = make_dataset(args, "val")
    anchor_params = anchor_params_from_args(args)

    bb = backbone_registry(args.backbone)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    from tdnet.ops.anchors import AnchorParameters

    n_anchors = (anchor_params or AnchorParameters.default).num_anchors
    model = bb.retinanet(train_ds.num_classes(), dtype=dtype, num_anchors=n_anchors)

    cfg = LoaderConfig(
        batch_size=args.batch_size,
        min_side=args.image_min_side,
        max_side=args.image_max_side,
        max_boxes=args.max_boxes,
        preprocess_mode=bb.preprocess_mode,
        device_normalize=args.device_normalize,
        random_transform=args.random_transform,
        seed=args.seed,
    )
    loader = BatchLoader(train_ds, cfg)

    mesh = create_mesh()
    if args.batch_size % len(mesh.devices.flat) != 0 and len(mesh.devices.flat) > 1:
        print(
            f"warning: batch size {args.batch_size} not divisible by "
            f"{len(mesh.devices.flat)} devices; falling back to single device",
            file=sys.stderr,
        )
        mesh = create_mesh(jax.devices()[:1])

    bucket0 = cfg.resolved_buckets()[0]
    state = create_train_state(
        model,
        jax.random.PRNGKey(args.seed),
        (args.batch_size, bucket0[0], bucket0[1], 3),
        tx=create_optimizer(args.lr, args.clipnorm),
        freeze_backbone=args.freeze_backbone,
    )
    state = jax.device_put(state, replicated_sharding(mesh))

    ckpt = Checkpointer(args.snapshot_path) if args.snapshots else None
    initial_epoch = 0
    if args.snapshot:
        resume = Checkpointer(args.snapshot)
        state = resume.restore(state)
        initial_epoch = int(state.step) // max(args.steps, 1)
        print(f"resumed from step {int(state.step)} (epoch {initial_epoch})")

    train_step = make_train_step(
        model, train_ds.num_classes(), anchor_params=anchor_params,
        preprocess_mode=bb.preprocess_mode,
    )

    evaluate_fn = None
    if args.evaluation and val_ds is not None:
        # one Predictor reused across epochs (weights are an argument of its
        # jitted pipeline, so swapping them does not retrace/recompile)
        predictor = Predictor(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            anchor_params=anchor_params,
            min_side=args.image_min_side,
            max_side=args.image_max_side,
            preprocess_mode=bb.preprocess_mode,
            score_threshold=args.score_threshold,
        )

        def evaluate_fn(state):
            predictor.variables = {
                "params": state.params,
                "batch_stats": state.batch_stats,
            }
            aps = evaluate(val_ds, predictor)
            total = sum(n for _, n in aps.values())
            mAP = (
                sum(ap * n for ap, n in aps.values()) / total if total else 0.0
            )
            return {"mAP": mAP}

    batches = prefetch_to_device(loader.forever(), batch_sharding(mesh))

    try:
        state = fit(
            state,
            train_step,
            batches,
            steps_per_epoch=args.steps,
            epochs=args.epochs,
            checkpointer=ckpt,
            evaluate_fn=evaluate_fn,
            lr_schedule=ReduceLROnPlateau(),
            metrics_path=args.metrics_path,
            tensorboard_dir=args.tensorboard_dir,
            log_every=args.log_every,
            initial_epoch=initial_epoch,
            profile_dir=args.profile_dir,
        )
    finally:
        batches.close()

    if args.model_path:
        save_model(
            args.model_path,
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            anchor_params=anchor_params,
            inference_config={
                "min_side": args.image_min_side,
                "max_side": args.image_max_side,
                "preprocess_mode": bb.preprocess_mode,
            },
        )
        print(f"saved deployable model to {args.model_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
