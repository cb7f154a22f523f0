"""Training-path fused-stem measurement (TPU): full train step under the
three input regimes at the product bucket —

1. f32: prenormalized float images (the round-2 baseline path),
2. u8-xla-stem: packed uint8 rows, Pallas normalize + XLA stem
   (round-3 first-half path; train/step.py packed branch),
3. u8-fused-stem: packed uint8 rows through the differentiable fused
   ingest+stem kernel (ops/stem_vjp.fused_stem_train — Pallas forward,
   rematerialized XLA backward),
4. u8-fused-stem-kbwd: same forward, all-Pallas backward kernel
   (TDNET_STEM_BWD=kernel; ops/pallas_stem.fused_stem_bwd_packed).

Prints one JSON line per (regime, batch). BENCH_BATCHES=8,16 by default.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def run_step_loop(train_step, state, batch_data, iters=6, inner=4):
    import jax

    s, metrics = train_step(state, batch_data)
    jax.device_get(metrics["loss"])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            s, metrics = train_step(s, batch_data)
        jax.device_get(metrics["loss"])
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts)) * 1000, s


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.step import create_train_state, make_train_step

    bucket = (800, 1344)
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "8,16").split(",")]
    regimes = os.environ.get(
        "BENCH_REGIMES",
        "f32,u8-xla-stem,u8-fused-stem,u8-fused-stem-kbwd").split(",")
    model = RetinaNet(num_classes=1, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    m = 8
    for batch in batches:
        raw = rng.randint(0, 256, (batch,) + bucket + (3,), dtype=np.uint8)
        base = {
            "gt_boxes": jnp.asarray(np.tile(
                np.array([[100, 100, 600, 500]], np.float32), (batch, m, 1))),
            "gt_labels": jnp.zeros((batch, m), jnp.int32),
            "gt_mask": jnp.asarray(np.tile(np.arange(m) < 3, (batch, 1))),
            "image_hw": jnp.tile(
                jnp.asarray([bucket[0], bucket[1]], jnp.float32), (batch, 1)),
        }
        from tdnet.data.image import CAFFE_MEAN_BGR

        packed_u8 = jnp.asarray(raw.reshape(batch, bucket[0], bucket[1] * 3))
        forms = {
            "f32": jnp.asarray(
                raw.astype(np.float32) - np.asarray(CAFFE_MEAN_BGR, np.float32)),
            # the three uint8 regimes share ONE host array / device buffer
            "u8-xla-stem": packed_u8,
            "u8-fused-stem": packed_u8,
            "u8-fused-stem-kbwd": packed_u8,
        }
        for regime in regimes:
            os.environ["TDNET_STEM_BWD"] = (
                "kernel" if regime.endswith("kbwd") else "remat")
            state = create_train_state(
                model, jax.random.PRNGKey(0), (1,) + bucket + (3,))
            step = make_train_step(
                model, num_classes=1,
                fused_stem=regime.startswith("u8-fused-stem"))
            batch_data = dict(base, images=jax.device_put(forms[regime]))
            ms, _ = run_step_loop(step, state, batch_data)
            print(json.dumps({
                "regime": regime, "batch": batch, "ms_per_step": round(ms, 2),
                "imgs_per_s": round(batch / ms * 1000, 1),
            }), flush=True)
            del state, step, batch_data
    return 0


if __name__ == "__main__":
    sys.exit(main())
