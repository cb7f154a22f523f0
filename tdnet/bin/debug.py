"""Data-pipeline inspection CLI (reference: keras_retinanet/bin/debug.py —
"is my data pipeline right"). Instead of a cv2.imshow loop, dumps annotated
PNGs: green = anchor-matched GT, red = unmatched GT, optional anchor boxes.

    python -m tdnet.bin.debug csv annotations.csv classes.csv --output-dir dbg/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tdnet.bin._common import add_dataset_args, anchor_params_from_args, make_dataset
from tdnet.data.generator import BatchLoader, LoaderConfig
from tdnet.native import compute_overlap
from tdnet.ops.anchors import anchors_for_shape
from tdnet.utils.visualization import draw_box, draw_caption


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Debug the tdnet data pipeline.")
    add_dataset_args(parser)
    parser.add_argument("--output-dir", default="./debug_images", type=str)
    parser.add_argument("--limit", default=10, type=int)
    parser.add_argument("--anchors", action="store_true",
                        help="also draw positive anchors")
    parser.add_argument("--random-transform", action="store_true")
    parser.add_argument("--image-min-side", default=800, type=int)
    parser.add_argument("--image-max-side", default=1333, type=int)
    parser.add_argument("--config", default=None, type=str)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    dataset = make_dataset(args, "train")
    anchor_params = anchor_params_from_args(args)
    os.makedirs(args.output_dir, exist_ok=True)

    # device_normalize=True keeps the canvas as raw uint8 pixels, so no
    # normalize/un-normalize round trip is needed — correct for every
    # backbone preprocess mode (caffe AND tf), unlike adding the caffe mean
    # back unconditionally.
    cfg = LoaderConfig(
        batch_size=1,
        min_side=args.image_min_side,
        max_side=args.image_max_side,
        random_transform=args.random_transform,
        shuffle=False,
        device_normalize=True,
    )
    loader = BatchLoader(dataset, cfg)

    count = 0
    for batch in loader.epoch():
        if count >= args.limit:
            break
        image = batch["images"][0].copy()
        anchors = anchors_for_shape(image.shape[:2], anchor_params=anchor_params)
        valid = batch["gt_mask"][0]
        boxes = batch["gt_boxes"][0][valid]
        labels = batch["gt_labels"][0][valid]

        if len(boxes):
            overlaps = compute_overlap(anchors, boxes.astype(np.float64))
            max_per_gt = overlaps.max(axis=0)
            pos_anchors = np.where(overlaps.max(axis=1) >= 0.5)[0]
        else:
            max_per_gt = np.zeros((0,))
            pos_anchors = np.array([], dtype=int)

        if args.anchors:
            for ai in pos_anchors[:200]:
                draw_box(image, anchors[ai], (255, 205, 0), thickness=1)

        for b, lbl, mo in zip(boxes, labels, max_per_gt):
            # green = matched by >=1 anchor, red = unmatched (reference colors)
            color = (0, 255, 0) if mo >= 0.5 else (0, 0, 255)
            draw_box(image, b, color)
            draw_caption(image, b, dataset.label_to_name(int(lbl)))

        idx = int(batch["indices"][0])
        out = os.path.join(args.output_dir, f"debug_{idx:05d}.png")
        import cv2

        cv2.imwrite(out, image)
        print(f"{out}: {len(boxes)} boxes, {len(pos_anchors)} positive anchors")
        count += 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
