"""Evaluation throughput on TPU: raw pages -> detections in original coords,
through the full host+device Predictor path (decode, resize, bucket-pad,
forward, NMS, rescale).

VERDICT round-1 weak #4: per-image eval left ~30x on the table. Measures
Predictor.predict_batch imgs/sec at several batch sizes, end-to-end wall
clock including host preprocessing.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_eval.py
Env: EVAL_BATCHES ("1,8,16,32"), EVAL_IMAGES (64).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.predictor import Predictor

    n_images = int(os.environ.get("EVAL_IMAGES", "64"))
    batch_list = [
        int(b) for b in os.environ.get("EVAL_BATCHES", "1,8,16,32").split(",")
    ]
    # uint8 canvases + in-graph normalization: 4x less host->device traffic.
    # Essential through the axon tunnel (~20 MB/s measured), useful on PCIe.
    device_prep = os.environ.get("EVAL_DEVICE_PREP", "0") == "1"

    model = RetinaNet(num_classes=1, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 800, 1344, 3), jnp.float32)
    )

    rng = np.random.RandomState(0)
    pages = [
        rng.uniform(0, 255, ((1100, 850, 3) if i % 2 else (850, 1100, 3)))
        .astype(np.float32)
        for i in range(n_images)
    ]

    for bs in batch_list:
        predictor = Predictor(model, variables, batch_size=bs,
                              device_preprocess=device_prep)
        # warm with one REAL chunk so every (bucket, sub-batch) executable
        # compiles before timing (pages alternate orientation, so chunk
        # composition is stable across the run)
        predictor.predict_batch(pages[:bs])
        predictor.predict_batch(pages[bs : 2 * bs] if bs < n_images else pages[:bs])
        t0 = time.perf_counter()
        done = 0
        for start in range(0, n_images, bs):
            chunk = pages[start : start + bs]
            r = predictor.predict_batch(chunk)
            done += len(r)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "eval_batch": bs,
            "imgs_per_s": round(done / dt, 1),
            "ms_per_img": round(dt / done * 1000, 2),
            "images": done,
            "ingestion": "uint8_device_norm" if device_prep else "f32_host_norm",
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
