"""End-to-end CLI smoke tests on a tiny synthetic table dataset
(reference: tests/bin/test_train.py style — run main() a few steps).

Covers the full reference CLI surface: train -> convert-model -> evaluate ->
predict -> debug, all through their argv entry points.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def table_dataset(tmp_path_factory):
    """8 synthetic 'document pages': white canvas + dark table rectangles."""
    from PIL import Image

    root = tmp_path_factory.mktemp("tables")
    rng = np.random.RandomState(0)
    rows = []
    for i in range(8):
        h, w = 96, 128
        img = np.full((h, w, 3), 245, np.uint8)
        x1, y1 = int(rng.randint(5, 40)), int(rng.randint(5, 30))
        x2, y2 = x1 + int(rng.randint(30, 60)), y1 + int(rng.randint(25, 50))
        x2, y2 = min(x2, w - 2), min(y2, h - 2)
        img[y1:y2, x1:x2] = (80, 90, 100)
        name = f"page{i}.png"
        Image.fromarray(img).save(root / name)
        rows.append(f"{name},{x1},{y1},{x2},{y2},table")

    (root / "annotations.csv").write_text("\n".join(rows) + "\n")
    (root / "classes.csv").write_text("table,0\n")
    return root


def _common_size_args():
    # tiny shapes so CPU compiles stay fast
    return ["--image-min-side", "96", "--image-max-side", "128"]


def test_cli_pipeline(table_dataset, tmp_path):
    from tdnet.bin import convert_model, debug, evaluate, predict, train

    snap = tmp_path / "snaps"
    model_path = tmp_path / "model.tdn"

    # --- train a handful of steps
    rc = train.main(
        [
            "--backbone", "resnet50",
            "--batch-size", "2",
            "--lr", "1e-3",
            "--clipnorm", "100.0",
            "--epochs", "2",
            "--steps", "4",
            "--snapshot-path", str(snap),
            "--model-path", str(model_path),
            "--log-every", "2",
            "--seed", "0",
            *_common_size_args(),
            "csv",
            str(table_dataset / "annotations.csv"),
            str(table_dataset / "classes.csv"),
        ]
    )
    assert rc == 0
    assert model_path.exists()
    assert any(snap.iterdir()), "snapshots written"

    # --- resume from snapshot (one more short epoch)
    rc = train.main(
        [
            "--batch-size", "2",
            "--epochs", "3",
            "--steps", "4",
            "--snapshot-path", str(snap),
            "--snapshot", str(snap),
            "--log-every", "4",
            *_common_size_args(),
            "csv",
            str(table_dataset / "annotations.csv"),
            str(table_dataset / "classes.csv"),
        ]
    )
    assert rc == 0

    # --- convert snapshot -> .tdn
    converted = tmp_path / "converted.tdn"
    rc = convert_model.main(
        [
            str(snap),
            str(converted),
            "--num-classes", "1",
            *_common_size_args(),
        ]
    )
    assert rc == 0 and converted.exists()

    # --- evaluate the .tdn (untrained-ish net: mAP may be 0; must run + print)
    rc = evaluate.main(
        [
            *_common_size_args(),
            "csv",
            str(table_dataset / "annotations.csv"),
            str(table_dataset / "classes.csv"),
            str(converted),
        ]
    )
    assert rc == 0

    # --- predict on two pages
    outdir = tmp_path / "pred"
    rc = predict.main(
        [
            str(model_path),
            str(table_dataset / "page0.png"),
            str(table_dataset / "page1.png"),
            "--output-dir", str(outdir),
            "--score-threshold", "0.0",
        ]
    )
    assert rc == 0
    dets = [
        json.loads(l)
        for l in (outdir / "detections.jsonl").read_text().splitlines()
    ]
    assert len(dets) == 2
    assert (outdir / "det_page0.png").exists()

    # --- debug dumps annotated images
    dbg = tmp_path / "dbg"
    rc = debug.main(
        [
            "--output-dir", str(dbg),
            "--limit", "2",
            "--anchors",
            *_common_size_args(),
            "csv",
            str(table_dataset / "annotations.csv"),
            str(table_dataset / "classes.csv"),
        ]
    )
    assert rc == 0
    assert len(list(dbg.glob("debug_*.png"))) == 2
