"""Evaluation CLI (reference: keras_retinanet/bin/evaluate.py).

    python -m tdnet.bin.evaluate csv annotations.csv classes.csv model.tdn

Prints per-class AP in the reference's format and the (weighted) mAP.
`model` may be a .tdn bundle or an orbax snapshot directory (then
--backbone/--num-classes describe the architecture).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from tdnet.bin._common import add_dataset_args, anchor_params_from_args, make_dataset
from tdnet.models import backbone as backbone_registry
from tdnet.models.io import anchor_params_from_meta, load_model
from tdnet.train.checkpoint import Checkpointer
from tdnet.train.predictor import Predictor
from tdnet.utils.eval import evaluate


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a tdnet RetinaNet.")
    add_dataset_args(
        parser, trailing=[("model", ".tdn bundle or snapshot directory")]
    )
    parser.add_argument("--backbone", default="resnet50", type=str)
    parser.add_argument("--score-threshold", default=0.05, type=float)
    parser.add_argument("--iou-threshold", default=0.5, type=float)
    parser.add_argument("--max-detections", default=100, type=int)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--image-min-side", default=800, type=int)
    parser.add_argument("--image-max-side", default=1333, type=int)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--coco", action="store_true",
                        help="also report the COCO 12-metric summary")
    parser.add_argument("--no-pallas", dest="use_pallas", action="store_false",
                        default=None,
                        help="disable the Pallas NMS kernel (default: on for TPU)")
    parser.add_argument("--pre-nms-top-k", default=1024, type=int,
                        help="per-class candidate cap before NMS; raise for "
                             "parity-harness runs with dense candidates")
    parser.add_argument("--eval-batch-size", default=None, type=int,
                        help="batch evaluation images per bucket "
                             "(default: 16 on TPU, 1 elsewhere)")
    parser.add_argument("--soft-nms-sigma", default=None, type=float,
                        help="gaussian soft-NMS sigma (> 0 replaces hard "
                             "NMS; default: the model bundle's setting)")
    parser.add_argument("--device-normalize", action="store_true",
                        help="ship uint8 canvases, normalize in-graph (4x "
                             "less host->device traffic; pixel values round "
                             "to uint8 before resize, so results can differ "
                             "at the last decimal from the host-norm path). "
                             "On TPU with a ResNet backbone this also "
                             "engages the fused Pallas ingest+stem kernel")
    parser.add_argument("--distributed", default=None, type=str,
                        metavar="COORD:PORT,NPROC,RANK",
                        help="multi-host eval: jax.distributed bring-up; "
                             "prediction is sharded across processes and "
                             "detections all-gathered — identical metrics "
                             "at 1/NPROC the prediction cost (rank 0 "
                             "prints)")
    parser.add_argument("--no-fused-stem", action="store_true",
                        help="keep the flat-normalize uint8 path instead of "
                             "the fused ingest+stem kernel")
    return parser.parse_args(argv)


def load_any_model(path, args, num_classes, dtype):
    """Load a .tdn bundle, orbax snapshot dir, or keras-retinanet .h5
    -> (model, variables, anchors, meta)."""
    if os.path.isdir(path) or path.endswith((".h5", ".hdf5")):
        from tdnet.ops.anchors import AnchorParameters

        anchors = anchor_params_from_args(args)
        bb = backbone_registry(args.backbone)
        model = bb.retinanet(
            num_classes, dtype=dtype,
            num_anchors=(anchors or AnchorParameters.default).num_anchors,
        )
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        if os.path.isdir(path):
            params, batch_stats = Checkpointer(path).restore_weights(
                template["params"], template.get("batch_stats", {})
            )
            variables = {"params": params, "batch_stats": batch_stats}
        else:  # reference-trained keras h5 (sub-pixel parity path)
            from tdnet.train.weights import load_initial_weights

            variables = load_initial_weights(
                path,
                {"params": template["params"],
                 "batch_stats": template.get("batch_stats", {})},
                backbone_name=args.backbone,
            )
        return model, variables, anchors, None
    model, variables, meta = load_model(path, dtype=dtype)
    anchors = anchor_params_from_args(args) or anchor_params_from_meta(meta)
    return model, variables, anchors, meta


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.distributed:
        from tdnet.bin.train import _maybe_init_distributed

        _maybe_init_distributed(args.distributed)
    shard = jax.process_count() > 1
    rank0 = jax.process_index() == 0
    dataset = make_dataset(args, "train")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    model, variables, anchors, meta = load_any_model(
        args.model, args, dataset.num_classes(), dtype
    )
    inference = (meta or {}).get("inference", {})

    predictor = Predictor(
        model,
        variables,
        anchor_params=anchors,
        min_side=args.image_min_side,
        max_side=args.image_max_side,
        preprocess_mode=inference.get("preprocess_mode", "caffe"),
        score_threshold=args.score_threshold,
        nms_threshold=inference.get("nms_threshold", 0.5),
        nms=inference.get("nms", True),
        class_specific_filter=inference.get("class_specific_filter", True),
        use_pallas=args.use_pallas,
        pre_nms_top_k=args.pre_nms_top_k,
        batch_size=args.eval_batch_size,
        device_preprocess=args.device_normalize,
        fused_stem=False if args.no_fused_stem else None,
        soft_nms_sigma=(
            args.soft_nms_sigma if args.soft_nms_sigma is not None
            else inference.get("soft_nms_sigma", 0.0)
        ),
    )

    aps = evaluate(
        dataset,
        predictor,
        iou_threshold=args.iou_threshold,
        score_threshold=args.score_threshold,
        max_detections=args.max_detections,
        shard=shard,
    )

    coco_res = None
    if args.coco:
        from tdnet.utils.coco_eval import evaluate_coco, summarize_coco

        # run BEFORE the rank gate: the sharded gather is a collective
        coco_res = evaluate_coco(
            dataset, predictor,
            score_threshold=args.score_threshold,
            max_detections=args.max_detections,
            shard=shard,
        )

    if not rank0:
        # sharded eval: every rank holds the identical result; one prints
        return 0

    # reference output format (bin/evaluate.py main tail)
    total_instances = 0
    weighted = 0.0
    simple_sum = 0.0
    present = 0
    for label, (ap, n) in sorted(aps.items()):
        print(
            f"{n} instances of class {dataset.label_to_name(label)} "
            f"with average precision: {ap:.4f}"
        )
        total_instances += n
        weighted += ap * n
        if n > 0:
            simple_sum += ap
            present += 1

    if total_instances == 0:
        print("No test instances found.")
        return 1
    print(f"mAP using the weighted average of precisions among classes: "
          f"{weighted / total_instances:.4f}")
    print(f"mAP: {simple_sum / max(present, 1):.4f}")

    if coco_res is not None:
        res = coco_res
        print(summarize_coco(res))
        for k, v in res.items():
            if k.startswith("AP_") and k not in (
                "AP_small", "AP_medium", "AP_large"
            ):
                print(f"{k}: {v:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
