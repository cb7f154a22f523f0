"""Training-step throughput bench (BASELINE config 3: RetinaNet training —
focal + anchor target assignment + smooth-L1 — on a TPU mesh).

Measures the full jitted train step (on-device targets, fwd+bwd, Adam) at
the 800x1344 document bucket. Prints one JSON line like bench.py.

Env: TRAIN_BENCH_BATCH (8), TRAIN_BENCH_ITERS (5), TRAIN_BENCH_BUCKET.
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
    from tdnet.parallel.mesh import batch_sharding, create_mesh, replicated_sharding
    from tdnet.train.step import create_train_state, make_train_step

    batch = int(os.environ.get("TRAIN_BENCH_BATCH", "8"))
    iters = int(os.environ.get("TRAIN_BENCH_ITERS", "5"))
    bucket = tuple(
        int(v) for v in os.environ.get("TRAIN_BENCH_BUCKET", "800x1344").split("x")
    )

    mesh = create_mesh()
    model = RetinaNet(num_classes=1, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (1,) + bucket + (3,))
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(model, num_classes=1)

    rng = np.random.RandomState(0)
    m = 8
    # TRAIN_BENCH_U8=1: packed uint8 canvases (the --device-normalize
    # loader path after data/prefetch.py packing) instead of f32
    u8 = os.environ.get("TRAIN_BENCH_U8", "0") == "1"
    if u8:
        images = rng.randint(
            0, 256, (batch,) + bucket + (3,), dtype=np.uint8
        ).reshape(batch, bucket[0], bucket[1] * 3)
    else:
        images = rng.uniform(
            -116, 139, (batch,) + bucket + (3,)).astype(np.float32)
    host_batch = {
        "images": images,
        "gt_boxes": np.tile(
            np.array([[[100.0, 100.0, 600.0, 500.0]]], np.float32), (batch, m, 1)
        ),
        "gt_labels": np.zeros((batch, m), np.int32),
        "gt_mask": np.tile(
            (np.arange(m) < 2)[None, :], (batch, 1)
        ),
        "image_hw": np.tile(np.array(bucket, np.float32), (batch, 1)),
    }
    dev_batch = jax.device_put(host_batch, batch_sharding(mesh))

    # compile + warmup (host fetch is the only reliable barrier on axon)
    state, metrics = step(state, dev_batch)
    loss0 = float(jax.device_get(metrics["loss"]))
    state, metrics = step(state, dev_batch)
    jax.device_get(metrics["loss"])

    times = []
    inner = int(os.environ.get('BENCH_INNER', '16'))  # round-4: +RTT/inner bias, see tools/_timing.py
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            state, metrics = step(state, dev_batch)
        jax.device_get(metrics["loss"])
        times.append((time.perf_counter() - t0) / inner)

    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": f"retinanet_resnet50_{bucket[0]}x{bucket[1]}_train_step",
                "value": round(batch / dt, 2),
                "unit": "images/sec/chip",
                "median_step_ms": round(dt * 1000, 2),
                "batch": batch,
                "input": "packed_uint8" if u8 else "f32",
                "loss0": round(loss0, 3),
                "device": jax.devices()[0].device_kind,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
