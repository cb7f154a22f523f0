"""Profile the TRAIN step on TPU: capture a jax.profiler trace of a few
packed-uint8 train steps (the --device-normalize product path) and print a
per-op device-time table aggregated from the Chrome-trace JSON.

Env: BENCH_BATCH (24), BENCH_STEPS (3), TRACE_DIR (/tmp/tdnet_train_trace),
TOP (30).

The aggregation walks the trace's complete ('X') events on TPU device
tracks, sums wall duration by event name, and reports ms per step — the
same method as the committed round-2 inference table (PERF.md "Committed
profiler trace").
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def build_step_and_batch(batch):
    import jax
    import jax.numpy as jnp

    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.step import create_train_state, make_train_step

    bucket = (800, 1344)
    model = RetinaNet(num_classes=1, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (1,) + bucket + (3,))
    step = make_train_step(model, num_classes=1)

    rng = np.random.RandomState(0)
    m = 8
    images = rng.randint(0, 256, (batch,) + bucket + (3,), dtype=np.uint8)
    batch_data = {
        "images": jax.device_put(
            jnp.asarray(images.reshape(batch, bucket[0], bucket[1] * 3))
        ),
        "gt_boxes": jax.device_put(
            jnp.asarray(
                np.tile(
                    np.array([[[100.0, 100.0, 600.0, 500.0]]], np.float32),
                    (batch, m, 1),
                )
            )
        ),
        "gt_labels": jnp.zeros((batch, m), jnp.int32),
        "gt_mask": jnp.asarray(np.tile((np.arange(m) < 2)[None, :], (batch, 1))),
        "image_hw": jnp.tile(
            jnp.asarray([bucket[0], bucket[1]], jnp.float32), (batch, 1)
        ),
    }
    return step, state, batch_data


def aggregate(trace_dir, steps, top):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        print("no trace json found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU device pids: process_name metadata containing 'TPU' and a
    # 'TensorFlow Ops'/'XLA Ops' style thread, else any non-host pid
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "/device" in n
    }
    totals = {}
    count = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        totals[name] = totals.get(name, 0.0) + dur
        count[name] = count.get(name, 0) + 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    print(f"pids: { {p: pid_names.get(p, '') for p in dev_pids} }")
    print(f"{'ms/step':>9}  {'calls':>6}  op")
    for name, ms in rows:
        print(f"{ms / steps:9.2f}  {count[name] // steps:6d}  {name[:110]}")
    print(
        json.dumps(
            {
                "total_device_ms_per_step": round(sum(totals.values()) / steps, 2),
                "trace": paths[-1],
            }
        )
    )


def main() -> int:
    import jax

    batch = int(os.environ.get("BENCH_BATCH", "24"))
    steps = int(os.environ.get("BENCH_STEPS", "3"))
    top = int(os.environ.get("TOP", "30"))
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/tdnet_train_trace")

    step, state, batch_data = build_step_and_batch(batch)

    s = state
    for _ in range(2):  # compile + settle
        s, metrics = step(s, batch_data)
    jax.device_get(metrics["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            s, metrics = step(s, batch_data)
        jax.device_get(metrics["loss"])
    time.sleep(1.0)
    aggregate(trace_dir, steps, top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
