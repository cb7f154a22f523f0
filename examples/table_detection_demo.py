"""End-to-end tdnet demo (the analog of the reference's
examples/ResNet50RetinaNet.ipynb inference walkthrough, extended with a tiny
training run since no pretrained table weights ship offline).

Generates a synthetic document-page dataset (white pages with dark "table"
rectangles), trains a few hundred steps, converts to a deployable .tdn, runs
the predictor and writes annotated pages.

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/table_detection_demo.py \
        --workdir /tmp/tdnet_demo [--steps 200] [--pages 24]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_dataset(root: str, pages: int, rng: np.random.RandomState) -> None:
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rows = []
    for i in range(pages):
        h, w = 320, 240  # portrait page
        img = np.full((h, w, 3), 248, np.uint8)
        n_tables = rng.randint(1, 3)
        for _ in range(n_tables):
            x1, y1 = int(rng.randint(5, w // 2)), int(rng.randint(5, h // 2))
            x2 = min(x1 + int(rng.randint(60, 140)), w - 4)
            y2 = min(y1 + int(rng.randint(40, 120)), h - 4)
            # table: grid of lines
            img[y1:y2, x1:x2] = 255
            img[y1:y2:12, x1:x2] = 90
            img[y1:y2, x1:x2:20] = 90
            rows.append(f"page{i:03d}.png,{x1},{y1},{x2},{y2},table")
        Image.fromarray(img).save(os.path.join(root, f"page{i:03d}.png"))
    with open(os.path.join(root, "annotations.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "classes.csv"), "w") as f:
        f.write("table,0\n")


def _iou(a, b) -> float:
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def make_varied_dataset(root: str, pages: int, rng: np.random.RandomState,
                        prefix: str = "page") -> None:
    """Richer page distribution for GENERALIZATION runs (round-4): page
    size, background shade, table count (1-4), table size, grid pitch and
    line shade all vary per page; unannotated "text block" distractors are
    drawn so the detector must learn table structure, not just "dark
    pixels"; tables are placed with pairwise IoU < 0.1 so eval matching is
    unambiguous. Same annotation contract as make_dataset. A held-out val
    set is just this function with a different RNG stream — same
    distribution, disjoint samples (reference analog: the fork's
    train-on-scans / evaluate-held-out recipe, upstream bin/train.py +
    bin/evaluate.py)."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rows = []
    for i in range(pages):
        h, w = int(rng.randint(280, 400)), int(rng.randint(200, 320))
        img = np.full((h, w, 3), int(rng.randint(240, 254)), np.uint8)
        # distractor text paragraphs: rows of mid-gray lines, NOT annotated
        for _ in range(int(rng.randint(1, 4))):
            tx, ty = int(rng.randint(5, w - 64)), int(rng.randint(5, h - 44))
            tw = int(rng.randint(40, min(120, w - tx - 4)))
            th = int(rng.randint(20, min(60, h - ty - 4)))
            img[ty:ty + th:6, tx:tx + tw] = 170
        boxes = []
        for t in range(int(rng.randint(1, 5))):
            for _ in range(20):
                tw = int(rng.randint(50, 160))
                th = int(rng.randint(35, 140))
                if tw >= w - 10 or th >= h - 10:
                    continue
                x1 = int(rng.randint(4, w - tw - 4))
                y1 = int(rng.randint(4, h - th - 4))
                box = (x1, y1, x1 + tw, y1 + th)
                if all(_iou(box, b) < 0.1 for b in boxes):
                    boxes.append(box)
                    break
        for x1, y1, x2, y2 in boxes:
            py, px = int(rng.randint(8, 16)), int(rng.randint(14, 26))
            shade = int(rng.randint(60, 110))
            img[y1:y2, x1:x2] = 255
            img[y1:y2:py, x1:x2] = shade
            img[y1:y2, x1:x2:px] = shade
            img[y1:y2, x1], img[y1:y2, x2 - 1] = shade, shade
            img[y1, x1:x2], img[y2 - 1, x1:x2] = shade, shade
            rows.append(f"{prefix}{i:03d}.png,{x1},{y1},{x2},{y2},table")
        Image.fromarray(img).save(os.path.join(root, f"{prefix}{i:03d}.png"))
    with open(os.path.join(root, "annotations.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "classes.csv"), "w") as f:
        f.write("table,0\n")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/tdnet_demo")
    parser.add_argument("--pages", type=int, default=24)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--lr", type=float, default=3e-4)
    args = parser.parse_args()

    data = os.path.join(args.workdir, "data")
    make_dataset(data, args.pages, np.random.RandomState(0))
    print(f"synthetic dataset at {data}")

    from tdnet.bin import predict, train

    model_path = os.path.join(args.workdir, "model.tdn")
    train.main([
        "--batch-size", "2",
        "--lr", str(args.lr),
        "--clipnorm", "100.0",
        "--epochs", "1",
        "--steps", str(args.steps),
        "--image-min-side", "320",
        "--image-max-side", "448",
        "--snapshot-path", os.path.join(args.workdir, "snaps"),
        "--model-path", model_path,
        "--log-every", "25",
        "csv",
        os.path.join(data, "annotations.csv"),
        os.path.join(data, "classes.csv"),
    ])

    out = os.path.join(args.workdir, "predictions")
    pages = [os.path.join(data, f"page{i:03d}.png") for i in range(4)]
    predict.main([
        model_path, *pages,
        "--output-dir", out,
        "--score-threshold", "0.3",
        "--labels", os.path.join(data, "classes.csv"),
    ])
    print(f"annotated pages in {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
