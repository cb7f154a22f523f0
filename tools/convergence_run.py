"""Round-3 convergence proof: overfit synthetic table pages to mAP >= 0.9.

The round-2 verdict's top gap was that tdnet had never been *shown* to
learn — every training test asserted only "loss is finite".  This driver
is the full-scale counterpart of tests/train/test_overfit_slow.py: it
generates the demo-style synthetic document-page dataset (reference
analog: the fork's README recipe, upstream bin/train.py training loop),
trains through the real CLI on whatever backend JAX picks (the TPU when
run under axon), evaluating on the train set each epoch, and writes

    artifacts/convergence_r3/metrics.jsonl   (per-step + per-epoch records)
    artifacts/convergence_r3/final_eval.txt  (reference-format AP printout)

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/tdnet_jax_cache \
      python tools/convergence_run.py --workdir /tmp/tdnet_conv
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


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/tdnet_conv")
    p.add_argument("--pages", type=int, default=48)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--out", default="artifacts/convergence_r3")
    args = p.parse_args()

    from examples.table_detection_demo import make_dataset

    data = os.path.join(args.workdir, "data")
    make_dataset(data, args.pages, np.random.RandomState(0))
    os.makedirs(args.out, exist_ok=True)
    metrics = os.path.join(args.out, "metrics.jsonl")
    # MetricsWriter appends — truncate so a rerun doesn't mix two runs
    # into the committed artifact (and corrupt the first_loss summary)
    if os.path.exists(metrics):
        os.unlink(metrics)

    from tdnet.bin import evaluate, train

    # Recipe notes (round-3 isolation matrix, /tmp/conv_sweep/iso_*):
    # - the Keras-parity plateau default (patience 2) halves the LR on
    #   epoch-loss noise long before convergence -> patience 40;
    # - a single-batch probe (tools/probe_reg.py) drives reg loss 4.9 -> 0.04
    #   in 300 steps, and the 48-page run needs ~10x that optimization
    #   budget: mAP hits 1.0 at epoch 86 and holds ~0.998 through 216;
    # - at epoch 217 a 250-epoch run BLEW UP (loss 0.45 -> 38 -> 1934):
    #   Adam's second moments go tiny at near-zero loss, so one gradient
    #   spike produces a catastrophic step (clipnorm 100 = effectively
    #   unclipped; the reference's Keras default is clipnorm 1e-3).
    #   Default epochs=150 stops well inside the measured stable zone.
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

    # Reference-format final eval printout (bin/evaluate.py output contract).
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = evaluate.main([
            "--image-min-side", "320", "--image-max-side", "448",
            "--eval-batch-size", "8", "--device-normalize",
            "csv", f"{data}/annotations.csv", f"{data}/classes.csv",
            os.path.join(args.workdir, "model.tdn"),
        ])
    text = buf.getvalue()
    print(text)
    with open(os.path.join(args.out, "final_eval.txt"), "w") as f:
        f.write(text)

    with open(metrics) as f:
        epochs = [json.loads(l) for l in f if "epoch_loss" in l]
    print(json.dumps({
        "epochs": len(epochs),
        "first_loss": epochs[0]["epoch_loss"],
        "last_loss": epochs[-1]["epoch_loss"],
        "final_mAP": epochs[-1].get("mAP"),
    }))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
