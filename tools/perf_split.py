"""Decompose the inference step into stages on the real TPU (VERDICT round-1
weak #1: 'we're at the roofline' needs a measurement, not an estimate).

Times, at the bench config (800x1344, batch 32, bf16):
  backbone        ResNet-50 C3..C5
  +fpn+heads      full model.apply
  +decode         + box decode/clip/sigmoid (no NMS)
  full            + per-class NMS (Pallas or jnp) + top-k merge

Each stage output is reduced to a scalar on device so the host fetch is one
float (tunnel round-trip amortized over BENCH_INNER chained dispatches, like
bench.py). Prints a JSON line per stage plus the deltas.
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

    from tdnet.models.detect import decode_boxes, detections_from_outputs
    from tdnet.models.retinanet import RetinaNet

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    inner = int(os.environ.get("BENCH_INNER", "4"))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    bucket = tuple(
        int(v) for v in os.environ.get("BENCH_BUCKET", "800x1344").split("x")
    )
    dtype = jnp.bfloat16

    model = RetinaNet(num_classes=1, backbone_name="resnet50", dtype=dtype)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1,) + bucket + (3,), jnp.float32)
    )

    @jax.jit
    def stage_backbone(variables, images):
        # run only the backbone by applying the full model's backbone module
        from tdnet.models.resnet import STAGE_SIZES, ResNet

        bb = ResNet(stage_sizes=STAGE_SIZES["resnet50"], dtype=dtype)
        c3, c4, c5 = bb.apply(
            {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"]["backbone"]},
            images,
        )
        return (c3.astype(jnp.float32).sum()
                + c4.astype(jnp.float32).sum()
                + c5.astype(jnp.float32).sum())

    @jax.jit
    def stage_model(variables, images):
        out = model.apply(variables, images)
        return (out["regression"].astype(jnp.float32).sum()
                + out["classification"].astype(jnp.float32).sum())

    @jax.jit
    def stage_decode(variables, images):
        out = model.apply(variables, images)
        boxes = decode_boxes(out["regression"], bucket)
        scores = jax.nn.sigmoid(out["classification"])
        return boxes.astype(jnp.float32).sum() + scores.astype(jnp.float32).sum()

    @jax.jit
    def stage_full(variables, images):
        out = model.apply(variables, images)
        det = detections_from_outputs(out, bucket, use_pallas=use_pallas)
        return det.scores.sum()

    x = np.random.RandomState(0).uniform(-116, 139, (batch,) + bucket + (3,))
    images = jax.device_put(jnp.asarray(x, jnp.float32))

    def timeit(fn):
        s = fn(variables, images)
        float(jax.device_get(s))  # compile + barrier
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(inner):
                s = fn(variables, images)
            float(jax.device_get(s))
            times.append((time.perf_counter() - t0) / inner)
        return float(np.median(times))

    stages = {
        "backbone": stage_backbone,
        "model(backbone+fpn+heads)": stage_model,
        "model+decode": stage_decode,
        "full(+nms)": stage_full,
    }
    results = {}
    for name, fn in stages.items():
        dt = timeit(fn)
        results[name] = round(dt * 1000, 2)
        print(json.dumps({"stage": name, "ms": results[name],
                          "imgs_per_s": round(batch / dt, 1)}))

    print(json.dumps({
        "delta_fpn_heads_ms": round(
            results["model(backbone+fpn+heads)"] - results["backbone"], 2),
        "delta_decode_ms": round(
            results["model+decode"] - results["model(backbone+fpn+heads)"], 2),
        "delta_nms_ms": round(
            results["full(+nms)"] - results["model+decode"], 2),
        "nms": "pallas" if use_pallas else "jnp",
        "batch": batch,
        "bucket": f"{bucket[0]}x{bucket[1]}",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
