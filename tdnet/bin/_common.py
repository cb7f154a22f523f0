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
    csv_parser = sub.add_parser("csv", help="CSV dataset (annotations + classes)")
    csv_parser.add_argument("annotations", help="path to annotations.csv")
    csv_parser.add_argument("classes", help="path to classes.csv")
    for name, help_text in trailing or []:
        csv_parser.add_argument(name, help=help_text)
    csv_parser.add_argument(
        "--val-annotations",
        help="path to validation annotations.csv (optional)",
        default=None,
    )


def make_dataset(args, split: str = "train") -> Optional[CSVDataset]:
    if args.dataset_type != "csv":
        raise ValueError(f"unsupported dataset type {args.dataset_type!r}")
    if split == "train":
        return CSVDataset(args.annotations, args.classes)
    if split == "val":
        if not getattr(args, "val_annotations", None):
            return None
        return CSVDataset(args.val_annotations, args.classes)
    raise ValueError(split)


def anchor_params_from_args(args) -> Optional[AnchorParameters]:
    config_path = getattr(args, "config", None)
    if not config_path:
        return None
    return parse_anchor_parameters(read_config_file(config_path))


def ensure_parent_dir(path: str) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
