"""CSV dataset contract (reference: preprocessing/csv_generator.py ~L1-200).

Formats (SURVEY.md §3 "CSV contract" — the fork's primary data interface):

  annotations.csv:  path,x1,y1,x2,y2,class_name
                    (ints, x2>x1, y2>y1; ALL box+class fields empty = negative
                    example)
  classes.csv:      class_name,id   (0-based, dense)

Parse errors carry line numbers, mirroring the reference's error behavior
(tested the same way: tests/data/test_csv_dataset.py with in-memory CSVs).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional

import numpy as np

from tdnet.data.image import read_image_bgr

__all__ = ["read_classes", "read_annotations", "CSVDataset"]


def _parse(value: str, kind, fmt: str, line: int):
    try:
        return kind(value)
    except ValueError as e:
        raise ValueError(fmt.format(line=line, value=value, error=e)) from None


def _open_for_csv(path):
    return open(path, "r", newline="")


def read_classes(csv_reader) -> Dict[str, int]:
    """Parse classes.csv rows 'class_name,id' (reference: _read_classes)."""
    result: Dict[str, int] = {}
    for line, row in enumerate(csv_reader, 1):
        try:
            class_name, class_id = row
        except ValueError:
            raise ValueError(
                f"line {line}: format should be 'class_name,class_id'"
            ) from None
        class_id = _parse(
            class_id, int, "line {line}: malformed class ID: {error}", line
        )
        if class_name in result:
            raise ValueError(f"line {line}: duplicate class name: '{class_name}'")
        result[class_name] = class_id
    return result


def read_annotations(csv_reader, classes: Dict[str, int]) -> Dict[str, List[dict]]:
    """Parse annotations.csv rows 'path,x1,y1,x2,y2,class_name'
    (reference: _read_annotations)."""
    result: Dict[str, List[dict]] = {}
    for line, row in enumerate(csv_reader, 1):
        try:
            img_file, x1, y1, x2, y2, class_name = row[:6]
        except ValueError:
            raise ValueError(
                f"line {line}: format should be "
                "'img_file,x1,y1,x2,y2,class_name' or 'img_file,,,,,'"
            ) from None

        result.setdefault(img_file, [])

        # all-empty box fields: negative example
        if (x1, y1, x2, y2, class_name) == ("", "", "", "", ""):
            continue

        x1 = _parse(x1, int, "line {line}: malformed x1: {error}", line)
        y1 = _parse(y1, int, "line {line}: malformed y1: {error}", line)
        x2 = _parse(x2, int, "line {line}: malformed x2: {error}", line)
        y2 = _parse(y2, int, "line {line}: malformed y2: {error}", line)

        if x2 <= x1:
            raise ValueError(f"line {line}: x2 ({x2}) must be higher than x1 ({x1})")
        if y2 <= y1:
            raise ValueError(f"line {line}: y2 ({y2}) must be higher than y1 ({y1})")

        if class_name not in classes:
            raise ValueError(
                f"line {line}: unknown class name: '{class_name}' "
                f"(classes: {sorted(classes)})"
            )

        result[img_file].append(
            {"x1": x1, "x2": x2, "y1": y1, "y2": y2, "class": class_name}
        )
    return result


class CSVDataset:
    """Dataset over the reference CSV contract (reference: CSVGenerator).

    Relative image paths resolve against the annotations file's directory
    (overridable with base_dir), matching the reference.
    """

    def __init__(
        self,
        csv_data_file: str,
        csv_class_file: str,
        base_dir: Optional[str] = None,
    ):
        self.base_dir = (
            os.path.dirname(csv_data_file) if base_dir is None else base_dir
        )

        with _open_for_csv(csv_class_file) as f:
            self.classes = read_classes(csv.reader(f, delimiter=","))

        self.labels = {v: k for k, v in self.classes.items()}

        with _open_for_csv(csv_data_file) as f:
            self.image_data = read_annotations(csv.reader(f, delimiter=","), self.classes)
        self.image_names = list(self.image_data.keys())

    # --- Dataset protocol (consumed by data/generator.py and utils/eval.py) ---

    def size(self) -> int:
        return len(self.image_names)

    def num_classes(self) -> int:
        return max(self.classes.values()) + 1 if self.classes else 0

    def has_label(self, label: int) -> bool:
        return label in self.labels

    def label_to_name(self, label: int) -> str:
        return self.labels[label]

    def name_to_label(self, name: str) -> int:
        return self.classes[name]

    def image_path(self, image_index: int) -> str:
        return os.path.join(self.base_dir, self.image_names[image_index])

    def image_aspect_ratio(self, image_index: int) -> float:
        from PIL import Image

        with Image.open(self.image_path(image_index)) as img:
            w, h = img.size
        return w / h

    def load_image(self, image_index: int) -> np.ndarray:
        return read_image_bgr(self.image_path(image_index))

    def max_annotations(self) -> int:
        """Densest image's GT count — the parsed rows are already in
        memory, so the auto-max_boxes sizing (data/generator.py
        _auto_max_boxes) never needs an O(N) load_annotations pre-pass
        for CSV datasets."""
        return max((len(a) for a in self.image_data.values()), default=0)

    def load_annotations(self, image_index: int) -> Dict[str, np.ndarray]:
        """Returns {'labels': (M,), 'bboxes': (M, 4) float64} like the
        reference's load_annotations."""
        path = self.image_names[image_index]
        annots = self.image_data[path]
        out = {
            "labels": np.empty((len(annots),), dtype=np.int64),
            "bboxes": np.empty((len(annots), 4), dtype=np.float64),
        }
        for idx, a in enumerate(annots):
            out["labels"][idx] = self.name_to_label(a["class"])
            out["bboxes"][idx, :] = [a["x1"], a["y1"], a["x2"], a["y2"]]
        return out
