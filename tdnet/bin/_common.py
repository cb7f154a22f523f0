"""Shared CLI plumbing for tdnet/bin (dataset construction, anchor config)."""

from __future__ import annotations

import argparse
import os
from typing import Optional

from tdnet.data.csv_dataset import CSVDataset
from tdnet.ops.anchors import AnchorParameters
from tdnet.utils.config import parse_anchor_parameters, read_config_file

__all__ = ["add_dataset_args", "make_dataset", "anchor_params_from_args"]


def add_dataset_args(parser: argparse.ArgumentParser, trailing=None) -> None:
    """csv subcommand arguments (reference: bin/train.py parse_args csv path).

    tdnet keeps the reference's positional layout:
        ... csv <annotations.csv> <classes.csv> [trailing...] [--val-annotations]

    `trailing` is a list of (name, help) positionals appended INSIDE the
    subcommand (modern argparse cannot parse main-parser positionals after a
    subparser, so the reference's `csv ann cls model.h5` order is preserved
    by attaching them here).
    """
    sub = parser.add_subparsers(
        help="dataset type", dest="dataset_type", required=True
    )
    trailing = trailing or []

    csv_parser = sub.add_parser("csv", help="CSV dataset (annotations + classes)")
    csv_parser.add_argument("annotations", help="path to annotations.csv")
    csv_parser.add_argument("classes", help="path to classes.csv")
    for name, help_text in trailing:
        csv_parser.add_argument(name, help=help_text)
    csv_parser.add_argument(
        "--val-annotations",
        help="path to validation annotations.csv (optional)",
        default=None,
    )

    voc_parser = sub.add_parser("pascal", help="Pascal VOC dataset (VOCdevkit)")
    voc_parser.add_argument("pascal_path", help="VOCdevkit directory")
    for name, help_text in trailing:
        voc_parser.add_argument(name, help=help_text)
    voc_parser.add_argument("--set-name", default="trainval")
    voc_parser.add_argument("--val-set-name", default="test")

    coco_parser = sub.add_parser("coco", help="COCO-format dataset")
    coco_parser.add_argument("coco_path", help="COCO root directory")
    for name, help_text in trailing:
        coco_parser.add_argument(name, help=help_text)
    coco_parser.add_argument("--set-name", default="train2017")
    coco_parser.add_argument("--val-set-name", default="val2017")

    kitti_parser = sub.add_parser("kitti", help="KITTI dataset")
    kitti_parser.add_argument("kitti_path", help="KITTI base directory")
    for name, help_text in trailing:
        kitti_parser.add_argument(name, help=help_text)
    kitti_parser.add_argument("--subset", default="train")
    kitti_parser.add_argument("--val-subset", default="val")

    oi_parser = sub.add_parser("open_images", help="Open Images dataset")
    oi_parser.add_argument("main_dir", help="Open Images root directory")
    for name, help_text in trailing:
        oi_parser.add_argument(name, help=help_text)
    oi_parser.add_argument("--subset", default="train")
    oi_parser.add_argument("--val-subset", default="validation")
    oi_parser.add_argument("--labels-filter", default=None,
                           help="comma-separated class names to keep")


def make_dataset(args, split: str = "train"):
    """Build the train/val dataset object for any dataset subcommand."""
    if split not in ("train", "val"):
        raise ValueError(split)
    t = args.dataset_type

    if t == "csv":
        if split == "train":
            return CSVDataset(args.annotations, args.classes)
        if not getattr(args, "val_annotations", None):
            return None
        return CSVDataset(args.val_annotations, args.classes)

    if t == "pascal":
        from tdnet.data.pascal_voc import PascalVocDataset

        name = args.set_name if split == "train" else args.val_set_name
        return PascalVocDataset(args.pascal_path, name)

    if t == "coco":
        from tdnet.data.coco import CocoDataset

        name = args.set_name if split == "train" else args.val_set_name
        return CocoDataset(args.coco_path, name)

    if t == "kitti":
        from tdnet.data.kitti import KittiDataset

        subset = args.subset if split == "train" else args.val_subset
        return KittiDataset(args.kitti_path, subset)

    if t == "open_images":
        from tdnet.data.open_images import OpenImagesDataset

        subset = args.subset if split == "train" else args.val_subset
        flt = args.labels_filter.split(",") if args.labels_filter else None
        return OpenImagesDataset(args.main_dir, subset, labels_filter=flt)

    raise ValueError(f"unsupported dataset type {t!r}")


def anchor_params_from_args(args) -> Optional[AnchorParameters]:
    config_path = getattr(args, "config", None)
    if not config_path:
        return None
    return parse_anchor_parameters(read_config_file(config_path))


def ensure_parent_dir(path: str) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
