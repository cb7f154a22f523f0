"""Host input-pipeline throughput: can the loader out-feed the TPU?

VERDICT round-1 missing #4: single-threaded decode was a plausible unmeasured
input-bound ceiling. This measures BatchLoader throughput (decode + optional
warpAffine augment + resize + normalize + canvas assembly) at the training
config, synchronous vs thread-pool workers, against the measured train-step
consumption rate (BASELINE.md: ~54 img/s/chip at batch 16).

Uses synthetic in-memory pages re-encoded to PNG on disk so the measurement
includes real imdecode cost. Pure host work — no device involved.

  PYTHONPATH=/root/repo python tools/bench_loader.py
Env: LOADER_BATCH (16), LOADER_IMAGES (64), LOADER_WORKERS ("0,2,4,8"),
LOADER_AUGMENT (1).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; force CPU
# through the config API so this host-only bench never opens the TPU
jax.config.update("jax_platforms", "cpu")


def main() -> int:
    import cv2

    from tdnet.data.csv_dataset import CSVDataset
    from tdnet.data.generator import BatchLoader, LoaderConfig

    batch = int(os.environ.get("LOADER_BATCH", "16"))
    n_images = int(os.environ.get("LOADER_IMAGES", "64"))
    worker_list = [
        int(w) for w in os.environ.get("LOADER_WORKERS", "0,2,4,8").split(",")
    ]
    augment = os.environ.get("LOADER_AUGMENT", "1") == "1"

    tmp = tempfile.mkdtemp(prefix="tdnet_loaderbench_")
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n_images):
        # document-page-like sizes so the resize rule lands in the 800 bucket
        h, w = (1100, 850) if i % 2 else (850, 1100)
        img = np.full((h, w, 3), 255, np.uint8)
        img[100:400, 80:700] = rng.randint(0, 120, (300, 620, 3), np.uint8)
        p = os.path.join(tmp, f"p{i}.png")
        cv2.imwrite(p, img)
        rows.append(f"{p},80,100,700,400,table")
    ann = os.path.join(tmp, "ann.csv")
    open(ann, "w").write("\n".join(rows) + "\n")
    cls = os.path.join(tmp, "cls.csv")
    open(cls, "w").write("table,0\n")

    ds = CSVDataset(ann, cls)
    for workers in worker_list:
        cfg = LoaderConfig(
            batch_size=batch, random_transform=augment, workers=workers,
            shuffle=False, seed=0,
        )
        loader = BatchLoader(ds, cfg)
        # warm one epoch (caches bucket assignment, page cache warm)
        for _ in loader.epoch():
            pass
        t0 = time.perf_counter()
        n = 0
        for b in loader.epoch():
            n += b["images"].shape[0]
        dt = time.perf_counter() - t0
        loader.close()
        print(json.dumps({
            "workers": workers,
            "imgs_per_s": round(n / dt, 1),
            "batch": batch,
            "augment": augment,
            "images": n,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
