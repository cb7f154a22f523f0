"""Standalone comparison: tiled (batch, tile)-grid NMS kernel vs the
row-batched (ROW_TILE rows per step, tiles walked in-kernel) variant.

At batch 128 / K 1024 the tiled grid runs 1024 kernel steps whose input
blocks never change between tile steps; the rows kernel runs 32. This tool
measures whether that grid restructuring matters at product shapes, plus
the jnp fixpoint path for reference. BENCH_BATCH/BENCH_K envs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tdnet.ops.nms import _nms_keep_presorted
    from tdnet.ops.pallas_nms import pallas_nms_keep, pallas_nms_keep_rows

    on_cpu = jax.default_backend() == "cpu"
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    k = int(os.environ.get("BENCH_K", "1024"))

    r = np.random.RandomState(0)
    centers = r.uniform(0, 1000, (batch, k, 2))
    wh = r.uniform(10, 200, (batch, k, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
    scores = r.rand(batch, k).astype(np.float32)
    order = np.argsort(-scores, 1)
    sboxes = jax.device_put(jnp.asarray(
        np.take_along_axis(boxes, order[..., None], 1), jnp.float32))
    valid = jax.device_put(jnp.asarray(
        np.take_along_axis(scores, order, 1) > 0.3))

    def timeit(fn):
        out = fn(sboxes, valid)
        jax.device_get(out[0, :8])
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn(sboxes, valid)
            jax.device_get(out[0, :8])
            times.append((time.perf_counter() - t0) / 4)
        return round(float(np.median(times)) * 1000, 2), out

    arms = {
        "tiled": jax.jit(lambda b_, v: pallas_nms_keep(
            b_, v, iou_threshold=0.5, interpret=on_cpu)),
        "rows": jax.jit(lambda b_, v: pallas_nms_keep_rows(
            b_, v, iou_threshold=0.5, interpret=on_cpu)),
        "jnp_fixpoint": jax.jit(jax.vmap(
            lambda b_, v: _nms_keep_presorted(b_, v, 0.5, False, False))),
    }
    outs = {}
    print(json.dumps({"batch": batch, "k": k}))
    for name, fn in arms.items():
        ms, out = timeit(fn)
        outs[name] = np.asarray(out)
        print(json.dumps({"arm": name, "ms": ms}), flush=True)
    same = {
        n: bool(np.array_equal(outs["tiled"], o)) for n, o in outs.items()
    }
    print(json.dumps({"equal_to_tiled": same}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
