"""Microbench the inference tail on TPU: where do the post-head ms go?

Feeds random head outputs (regression (B,N,4), classification (B,N,C)) and
times: full tail (pallas / jnp NMS), threshold+top-k only (nms=False),
bare lax.top_k over N, and a two-stage exact top-k reformulation.
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

    from tdnet.models.detect import detections_from_outputs
    from tdnet.ops.anchors import anchors_for_shape

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    classes = int(os.environ.get("BENCH_CLASSES", "1"))
    bucket = (800, 1344)
    n = anchors_for_shape(bucket).shape[0]
    print(json.dumps({"anchors": int(n), "batch": batch, "classes": classes}))

    rng = np.random.RandomState(0)
    reg = jax.device_put(jnp.asarray(
        rng.randn(batch, n, 4) * 0.1, jnp.float32))
    # logits biased low like a trained net: ~1% above the 0.05 threshold
    cls = jax.device_put(jnp.asarray(
        rng.randn(batch, n, classes) * 1.5 - 4.5, jnp.float32))
    outputs = {"regression": reg, "classification": cls}

    def timeit(fn, *args):
        r = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(r)[0])
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            for _ in range(4):
                r = fn(*args)
            jax.device_get(jax.tree_util.tree_leaves(r)[0])
            times.append((time.perf_counter() - t0) / 4)
        return float(np.median(times)) * 1000

    @jax.jit
    def tail_pallas(outputs):
        return detections_from_outputs(outputs, bucket, use_pallas=True)

    @jax.jit
    def tail_jnp(outputs):
        return detections_from_outputs(outputs, bucket, use_pallas=False)

    @jax.jit
    def tail_no_nms(outputs):
        return detections_from_outputs(outputs, bucket, nms=False)

    @jax.jit
    def bare_topk(outputs):
        scores = jax.nn.sigmoid(outputs["classification"])
        masked = jnp.where(scores > 0.05, scores, -jnp.inf)
        masked = jnp.transpose(masked, (0, 2, 1))  # (B, C, N)
        return jax.lax.top_k(masked, 1024)

    @jax.jit
    def twostage_topk(outputs):
        # exact: split N into G groups, top-k within groups, then merge.
        # every global top-1024 element is in its group's top-1024.
        scores = jax.nn.sigmoid(outputs["classification"])
        masked = jnp.where(scores > 0.05, scores, -jnp.inf)
        masked = jnp.transpose(masked, (0, 2, 1))  # (B, C, N)
        k = 1024
        g = 8
        nn_ = masked.shape[-1]
        pad = (-nn_) % g
        m = jnp.pad(masked, ((0, 0), (0, 0), (0, pad)),
                    constant_values=-jnp.inf)
        m = m.reshape(batch, classes, g, -1)
        sv, si = jax.lax.top_k(m, k)  # (B, C, G, k)
        base = (jnp.arange(g) * (m.shape[-1]))[None, None, :, None]
        si = si + base
        sv = sv.reshape(batch, classes, g * k)
        si = si.reshape(batch, classes, g * k)
        fv, fi = jax.lax.top_k(sv, k)
        return fv, jnp.take_along_axis(si, fi, axis=-1)

    results = {}
    for name, fn in [
        ("tail_pallas", tail_pallas),
        ("tail_jnp", tail_jnp),
        ("tail_no_nms", tail_no_nms),
        ("bare_topk", bare_topk),
        ("twostage_topk", twostage_topk),
    ]:
        ms = timeit(fn, outputs)
        results[name] = round(ms, 2)
        print(json.dumps({"stage": name, "ms": results[name]}))

    # verify two-stage == bare top-k (values)
    v1, i1 = jax.device_get(bare_topk(outputs))
    v2, i2 = jax.device_get(twostage_topk(outputs))
    exact = bool(np.array_equal(v1, v2))
    print(json.dumps({"twostage_exact_values": exact,
                      "indices_equal": bool(np.array_equal(i1, i2))}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
