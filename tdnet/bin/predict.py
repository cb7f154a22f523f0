"""Inference CLI (the fork's predict/visualize script — SURVEY.md §2.2
"Fork delta": predict/draw script mirroring the example notebook).

    python -m tdnet.bin.predict model.tdn page1.png page2.png \
        --output-dir out/ --score-threshold 0.5

Writes annotated copies + a JSONL of detections in original image coords.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax.numpy as jnp
import numpy as np

from tdnet.data.image import read_image_bgr
from tdnet.models.io import anchor_params_from_meta, load_model
from tdnet.train.predictor import Predictor
from tdnet.utils.visualization import draw_detections


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Run tdnet inference on images.")
    parser.add_argument("model", help=".tdn model bundle")
    parser.add_argument("images", nargs="+", help="input image paths")
    parser.add_argument("--output-dir", default="./predictions", type=str)
    parser.add_argument("--score-threshold", default=0.5, type=float,
                        help="drawing threshold (reference fork uses ~0.5)")
    parser.add_argument("--labels", default=None, type=str,
                        help="optional classes.csv for label names")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--no-pallas", dest="use_pallas", action="store_false",
                        default=None,
                        help="disable the Pallas NMS kernel (default: on for TPU)")
    parser.add_argument("--pre-nms-top-k", default=1024, type=int)
    parser.add_argument("--soft-nms-sigma", default=None, type=float,
                        help="gaussian soft-NMS sigma (> 0 replaces hard "
                             "NMS; default: the model bundle's setting)")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    model, variables, meta = load_model(
        args.model, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    inference = meta.get("inference", {})
    predictor = Predictor(
        model,
        variables,
        anchor_params=anchor_params_from_meta(meta),
        min_side=inference.get("min_side", 800),
        max_side=inference.get("max_side", 1333),
        preprocess_mode=inference.get("preprocess_mode", "caffe"),
        score_threshold=inference.get("score_threshold", 0.05),
        nms_threshold=inference.get("nms_threshold", 0.5),
        nms=inference.get("nms", True),
        class_specific_filter=inference.get("class_specific_filter", True),
        max_detections=inference.get("max_detections", 300),
        use_pallas=args.use_pallas,
        pre_nms_top_k=args.pre_nms_top_k,
        soft_nms_sigma=(
            args.soft_nms_sigma if args.soft_nms_sigma is not None
            else inference.get("soft_nms_sigma", 0.0)
        ),
    )

    label_to_name = None
    if args.labels:
        import csv

        from tdnet.data.csv_dataset import read_classes

        with open(args.labels, newline="") as f:
            classes = read_classes(csv.reader(f))
        names = {v: k for k, v in classes.items()}
        label_to_name = lambda l: names.get(l, str(l))

    jsonl_path = os.path.join(args.output_dir, "detections.jsonl")
    with open(jsonl_path, "w") as jf:
        for path in args.images:
            image = read_image_bgr(path)
            t0 = time.perf_counter()
            boxes, scores, labels = predictor(image)
            dt = time.perf_counter() - t0

            draw = image.astype(np.uint8).copy()
            draw_detections(
                draw, boxes, scores, labels,
                label_to_name=label_to_name,
                score_threshold=args.score_threshold,
            )
            out_path = os.path.join(
                args.output_dir, "det_" + os.path.basename(path)
            )
            import cv2

            cv2.imwrite(out_path, draw)

            kept = scores > args.score_threshold
            jf.write(json.dumps({
                "image": path,
                "time_s": round(dt, 4),
                "detections": [
                    {
                        "box": [round(float(v), 2) for v in boxes[i]],
                        "score": round(float(scores[i]), 4),
                        "label": int(labels[i]),
                    }
                    for i in np.where(kept)[0]
                ],
            }) + "\n")
            print(f"{path}: {int(kept.sum())} detections "
                  f"({dt * 1000:.1f} ms) -> {out_path}")
    print(f"wrote {jsonl_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
