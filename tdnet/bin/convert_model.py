"""Snapshot -> deployable model conversion (reference:
keras_retinanet/bin/convert_model.py — the training/inference graph split).

    python -m tdnet.bin.convert_model snapshots/ model.tdn \
        --backbone resnet50 --num-classes 1 [--no-nms] [--config anchors.ini]

Strips optimizer state from an orbax snapshot and writes a .tdn bundle with
the inference configuration (NMS settings, anchors, preprocessing) baked in.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from tdnet.bin._common import anchor_params_from_args, ensure_parent_dir
from tdnet.models import backbone as backbone_registry
from tdnet.models.io import save_model
from tdnet.train.checkpoint import Checkpointer


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert a training snapshot into a deployable .tdn model."
    )
    parser.add_argument("snapshot", help="orbax snapshot directory")
    parser.add_argument("model_out", help="output .tdn path")
    parser.add_argument("--backbone", default="resnet50", type=str)
    parser.add_argument("--num-classes", default=1, type=int)
    parser.add_argument("--step", default=None, type=int,
                        help="snapshot step (default: latest)")
    parser.add_argument("--no-nms", dest="nms", action="store_false")
    parser.add_argument("--no-class-specific-filter", dest="class_specific_filter",
                        action="store_false")
    parser.add_argument("--score-threshold", default=0.05, type=float)
    parser.add_argument("--nms-threshold", default=0.5, type=float)
    parser.add_argument("--max-detections", default=300, type=int)
    parser.add_argument("--soft-nms-sigma", default=0.0, type=float,
                        help="bake gaussian soft-NMS into the bundle (> 0 replaces hard NMS at inference)")
    parser.add_argument("--image-min-side", default=800, type=int)
    parser.add_argument("--image-max-side", default=1333, type=int)
    parser.add_argument("--config", default=None, type=str)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from tdnet.ops.anchors import AnchorParameters

    anchors = anchor_params_from_args(args)
    bb = backbone_registry(args.backbone)
    model = bb.retinanet(
        args.num_classes, dtype=jnp.float32,
        num_anchors=(anchors or AnchorParameters.default).num_anchors,
    )
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ckpt = Checkpointer(args.snapshot)
    step = args.step if args.step is not None else ckpt.latest_step()
    params, batch_stats = ckpt.restore_weights(
        template["params"], template.get("batch_stats", {}), step=step
    )

    ensure_parent_dir(args.model_out)
    save_model(
        args.model_out,
        model,
        {"params": params, "batch_stats": batch_stats},
        anchor_params=anchors,
        inference_config={
            "nms": args.nms,
            "class_specific_filter": args.class_specific_filter,
            "score_threshold": args.score_threshold,
            "nms_threshold": args.nms_threshold,
            "soft_nms_sigma": args.soft_nms_sigma,
            "max_detections": args.max_detections,
            "min_side": args.image_min_side,
            "max_side": args.image_max_side,
            "preprocess_mode": bb.preprocess_mode,
        },
    )
    print(f"converted step-{step} snapshot -> {args.model_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
