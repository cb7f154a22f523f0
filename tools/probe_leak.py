"""Host-memory leak bisection for the round-4 OOM.

The 800x1344 generalization run grew to 130 GB RSS over ~81 epochs
(~1000 train steps + 81 evals at batch 8) and was OOM-killed — roughly
one 103 MB host f32 batch leaked per step. This probe isolates the
leaking stage by running each phase in-process and sampling RSS +
jax.live_arrays() around it:

  A. fixed device batch, N train steps        (step/donation/tunnel only)
  B. loader+prefetch batches, N train steps   (adds host pipeline)
  C. M Predictor evals over a small dataset   (adds the eval path)

    python tools/probe_leak.py [--steps 60] [--evals 6]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def snap(tag, jax):
    gc.collect()
    n = len(jax.live_arrays())
    print(f"{tag:42s} rss={rss_mb():9.1f} MB  live_arrays={n}", flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--evals", type=int, default=6)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=[800, 1344])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from examples.table_detection_demo import make_varied_dataset
    from tdnet.data.csv_dataset import CSVDataset
    from tdnet.data.generator import BatchLoader, LoaderConfig
    from tdnet.data.prefetch import prefetch_to_device
    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.step import (create_optimizer, create_train_state,
                                  make_train_step)

    H, W = args.hw
    b = args.batch
    model = RetinaNet(num_classes=1, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (b, H, W, 3),
        tx=create_optimizer(1e-3, 100.0))
    step = make_train_step(model, num_classes=1, fused_stem=False)
    snap("init", jax)

    # ---- phase A: fixed device batch
    rs = np.random.RandomState(0)
    host_batch = {
        "images": rs.uniform(-100, 100, (b, H, W, 3)).astype(np.float32),
        "gt_boxes": np.tile(np.array([[[80.0, 80.0, 400.0, 320.0]]],
                                     np.float32), (b, 1, 1)),
        "gt_labels": np.zeros((b, 1), np.int32),
        "gt_mask": np.ones((b, 1), bool),
        "image_hw": np.tile(np.array([H, W], np.float32), (b, 1)),
    }
    fixed = jax.device_put(host_batch)
    state, m = step(state, fixed)
    jax.block_until_ready(m["loss"])
    snap("A warm (1 step, fixed batch)", jax)
    for i in range(args.steps):
        state, m = step(state, fixed)
    jax.block_until_ready(m["loss"])
    snap(f"A after {args.steps} steps fixed batch", jax)

    # ---- phase B: loader + prefetch (fresh host batches)
    work = "/tmp/probe_leak_data"
    if not os.path.exists(os.path.join(work, "annotations.csv")):
        make_varied_dataset(work, 24, np.random.RandomState(0))
    ds = CSVDataset(os.path.join(work, "annotations.csv"),
                    os.path.join(work, "classes.csv"))
    loader = BatchLoader(ds, LoaderConfig(
        batch_size=b, min_side=800, max_side=1344, random_transform=True,
        seed=0))
    batches = prefetch_to_device(loader.forever())
    state2 = create_train_state(
        model, jax.random.PRNGKey(1), (b, H, W, 3),
        tx=create_optimizer(1e-3, 100.0))
    snap("B loader built", jax)
    for i in range(args.steps):
        state2, m = step(state2, next(batches))
        if (i + 1) % 20 == 0:
            jax.block_until_ready(m["loss"])
            snap(f"B after {i + 1} loader steps", jax)
    batches.close()
    loader.close()
    del state2
    snap("B closed", jax)

    # ---- phase C: Predictor evals
    from tdnet.train.predictor import Predictor
    from tdnet.utils.eval import evaluate

    predictor = Predictor(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        min_side=800, max_side=1344, batch_size=8)
    for i in range(args.evals):
        evaluate(ds, predictor)
        snap(f"C after eval {i + 1}", jax)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
