"""Learning verification (TDNET_SLOW=1): the framework must actually LEARN.

Round-2 verdict: every training test asserted only "loss is finite" — a
train step with a subtle sign/normalization bug would have passed the whole
suite. This test overfits a tiny synthetic table dataset through the real
train CLI and asserts that (a) the loss drops by >= 5x and (b) train-set
mAP ends above 0.5 — chance level for an untrained net is ~0.

Gated behind TDNET_SLOW=1 (several minutes of CPU training) next to
tests/parallel/test_bucket_mesh_slow.py; the committed TPU convergence run
(artifacts/convergence_r3/) is the full-scale counterpart.
"""

import json
import os

import numpy as np
import pytest

slow = pytest.mark.skipif(
    os.environ.get("TDNET_SLOW") != "1",
    reason="set TDNET_SLOW=1 to run the multi-minute overfit test",
)


def _write_dataset(work, n=12):
    import cv2

    rng = np.random.RandomState(3)
    rows = []
    for i in range(n):
        img = np.full((60, 100, 3), 250, np.uint8)
        x1, y1 = rng.randint(4, 24), rng.randint(4, 16)
        x2, y2 = rng.randint(60, 96), rng.randint(40, 56)
        img[y1:y2, x1:x2] = 255
        img[y1:y2:8, x1:x2] = 70   # table rows
        img[y1:y2, x1:x2:14] = 70  # table columns
        cv2.imwrite(f"{work}/img{i}.png", img)
        rows.append(f"{work}/img{i}.png,{x1},{y1},{x2},{y2},table")
    with open(f"{work}/ann.csv", "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(f"{work}/classes.csv", "w") as f:
        f.write("table,0\n")


@slow
def test_overfit_tiny_tables_loss_drops_and_ap_rises(tmp_path):
    from tdnet.bin import train

    work = str(tmp_path)
    _write_dataset(work)
    metrics = os.path.join(work, "metrics.jsonl")

    rc = train.main([
        "--batch-size", "2", "--steps", "0", "--epochs", "25",
        "--lr", "1e-3", "--clipnorm", "100.0",
        "--image-min-side", "64", "--image-max-side", "128",
        "--snapshot-path", os.path.join(work, "snaps"),
        "--metrics-path", metrics, "--log-every", "6",
        "--evaluation", "--eval-batch-size", "1",
        # no --bn-warmup: the round-3 isolation matrix measured warm-up
        # SLOWING from-scratch overfit (train/weights.py docstring) —
        # the test follows the documented recipe
        "csv", f"{work}/ann.csv", f"{work}/classes.csv",
        "--val-annotations", f"{work}/ann.csv",
    ])
    assert rc == 0

    with open(metrics) as f:
        recs = [json.loads(l) for l in f]
    epochs = [r for r in recs if "epoch_loss" in r]
    assert len(epochs) == 25

    first, last = epochs[0]["epoch_loss"], epochs[-1]["epoch_loss"]
    assert last < first / 5, f"loss did not drop 5x: {first} -> {last}"

    final_map = epochs[-1]["mAP"]
    assert final_map > 0.5, f"train-set mAP after overfit too low: {final_map}"
