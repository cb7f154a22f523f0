"""Multiclass convergence proof: overfit synthetic 3-class page layouts.

artifacts/convergence_r3 proved the framework learns on the single-class
table task (train mAP 0.9998).  This driver extends the proof to the
multi-class page-layout configuration (BASELINE config 5: tables /
figures / text with class-aware decode) — the combination the e2e test
exercises but never trains to convergence
(tests/bin/test_multiclass_page_layout.py "the net barely trained").

Same recipe as tools/convergence_run.py (whose docstring records why:
plateau patience 40, clipnorm 100, epochs inside the measured Adam
stability zone), but with three visually distinct object classes so the
classification subnet must actually separate categories:

  table  — white cell grid with dark rules
  figure — dark filled panel with a lighter inset
  text   — paragraph block of thin horizontal dark lines

Writes
    artifacts/convergence_mc_r3/metrics.jsonl   per-step + per-epoch records
    artifacts/convergence_mc_r3/final_eval.txt  reference-format per-class APs
    artifacts/convergence_mc_r3/final_eval_softnms.txt  config-5 soft-NMS arm

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tdnet_jax_cache \
      python tools/convergence_multiclass.py --workdir /tmp/tdnet_conv_mc
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLASSES = ("table", "figure", "text")


def make_layout_dataset(root: str, pages: int, rng: np.random.RandomState) -> None:
    """Portrait pages with non-overlapping table/figure/text blocks."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rows = []
    for i in range(pages):
        h, w = 320, 240
        img = np.full((h, w, 3), 248, np.uint8)
        occupied = []  # (x1, y1, x2, y2) — keep boxes disjoint so GT is clean

        def place(bw_lo, bw_hi, bh_lo, bh_hi):
            for _ in range(20):  # rejection-sample a free slot
                bw = int(rng.randint(bw_lo, bw_hi))
                bh = int(rng.randint(bh_lo, bh_hi))
                x1 = int(rng.randint(4, max(5, w - bw - 4)))
                y1 = int(rng.randint(4, max(5, h - bh - 4)))
                x2, y2 = min(x1 + bw, w - 4), min(y1 + bh, h - 4)
                if all(x2 + 4 <= ox1 or ox2 + 4 <= x1 or y2 + 4 <= oy1
                       or oy2 + 4 <= y1 for ox1, oy1, ox2, oy2 in occupied):
                    occupied.append((x1, y1, x2, y2))
                    return x1, y1, x2, y2
            return None

        for _ in range(rng.randint(1, 3)):  # tables
            slot = place(70, 130, 50, 100)
            if slot is None:
                continue
            x1, y1, x2, y2 = slot
            img[y1:y2, x1:x2] = 255
            img[y1:y2:12, x1:x2] = 90
            img[y1:y2, x1:x2:20] = 90
            rows.append(f"page{i:03d}.png,{x1},{y1},{x2},{y2},table")
        for _ in range(rng.randint(1, 3)):  # figures
            slot = place(50, 100, 40, 90)
            if slot is None:
                continue
            x1, y1, x2, y2 = slot
            img[y1:y2, x1:x2] = (70, 80, 110)
            ix1, iy1 = x1 + (x2 - x1) // 4, y1 + (y2 - y1) // 4
            ix2, iy2 = x1 + 3 * (x2 - x1) // 4, y1 + 3 * (y2 - y1) // 4
            img[iy1:iy2, ix1:ix2] = (150, 160, 190)
            rows.append(f"page{i:03d}.png,{x1},{y1},{x2},{y2},figure")
        for _ in range(rng.randint(1, 4)):  # text paragraphs
            slot = place(60, 120, 24, 60)
            if slot is None:
                continue
            x1, y1, x2, y2 = slot
            for ly in range(y1 + 2, y2 - 1, 6):  # thin line rows
                lx2 = x2 - int(rng.randint(0, max(1, (x2 - x1) // 3)))
                img[ly:ly + 2, x1:lx2] = 60
            rows.append(f"page{i:03d}.png,{x1},{y1},{x2},{y2},text")
        Image.fromarray(img).save(os.path.join(root, f"page{i:03d}.png"))
    with open(os.path.join(root, "annotations.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "classes.csv"), "w") as f:
        f.write("".join(f"{c},{j}\n" for j, c in enumerate(CLASSES)))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/tdnet_conv_mc")
    p.add_argument("--pages", type=int, default=48)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--out", default="artifacts/convergence_mc_r3")
    args = p.parse_args()

    data = os.path.join(args.workdir, "data")
    make_layout_dataset(data, args.pages, np.random.RandomState(0))
    os.makedirs(args.out, exist_ok=True)
    metrics = os.path.join(args.out, "metrics.jsonl")
    if os.path.exists(metrics):  # MetricsWriter appends; keep one run per file
        os.unlink(metrics)

    from tdnet.bin import evaluate, train

    rc = train.main([
        "--batch-size", str(args.batch_size), "--steps", "0",
        "--epochs", str(args.epochs), "--lr", str(args.lr),
        "--clipnorm", "100.0",
        "--reduce-lr-patience", "40", "--reduce-lr-factor", "0.5",
        "--image-min-side", "320", "--image-max-side", "448",
        "--no-snapshots",
        "--model-path", os.path.join(args.workdir, "model.tdn"),
        "--metrics-path", metrics, "--log-every", "12",
        "--evaluation", "--eval-batch-size", "8",
        "csv", f"{data}/annotations.csv", f"{data}/classes.csv",
        "--val-annotations", f"{data}/annotations.csv",
    ])
    if rc != 0:
        print(f"train failed rc={rc}")
        return rc

    # Reference-format per-class eval (bin/evaluate.py output contract),
    # plus the config-5 soft-NMS arm over the same weights.
    for name, extra in (("final_eval.txt", []),
                        ("final_eval_softnms.txt", ["--soft-nms-sigma", "0.5"])):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = evaluate.main([
                "--image-min-side", "320", "--image-max-side", "448",
                "--eval-batch-size", "8", "--device-normalize", *extra,
                "csv", f"{data}/annotations.csv", f"{data}/classes.csv",
                os.path.join(args.workdir, "model.tdn"),
            ])
        text = buf.getvalue()
        print(f"== {name} ==\n{text}")
        with open(os.path.join(args.out, name), "w") as f:
            f.write(text)
        if rc != 0:
            return rc

    with open(metrics) as f:
        epochs = [json.loads(l) for l in f if "epoch_loss" in l]
    print(json.dumps({
        "epochs": len(epochs),
        "first_loss": epochs[0]["epoch_loss"],
        "last_loss": epochs[-1]["epoch_loss"],
        "final_mAP": epochs[-1].get("mAP"),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
