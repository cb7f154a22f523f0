"""Batch-128 inference-tail decomposition + deferred-decode prototype.

Round-3 follow-up to tools/perf_tail.py: at batch 128 the tail costs
~58 ms (pallas) / ~54 (jnp) / ~39 (nms=False) of a ~478 ms step. This
tool answers WHERE those ms go and measures an exact reformulation:

- top-k on raw logits (sigmoid is monotonic; threshold 0.05 becomes a
  conservative logit threshold, with the exact f32 score re-mask applied
  to the K candidates only);
- decode+clip deferred to the K candidates (elementwise per anchor, so
  gather-then-decode == decode-then-gather bit-for-bit in f32);
- final boxes gathered from the small candidate table, not (B, N, 4).

Stages timed (BENCH_BATCH/BENCH_CLASSES envs; defaults 128/1):
  decode_full        bbox_transform_inv+clip over all (B, N, 4)
  sigmoid_mask_t     sigmoid + threshold mask + (B,C,N) transpose
  topk_f32_g{8..64}  exact two-stage top-k group sweep, f32 scores
  topk_bf16_g32      same on bf16 logits
  gather_cand        take_along_axis of (B,C,K,4) rows from (B,N,4)
  tail_current       detections_from_outputs (pallas + jnp arms)
  tail_deferred      the prototype, checked EXACTLY equal to current
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
    from tdnet.ops.anchors import anchors_for_shape
    from tdnet.ops.nms import exact_topk_lastdim

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    classes = int(os.environ.get("BENCH_CLASSES", "1"))
    on_cpu = jax.default_backend() == "cpu"  # correctness-only mode
    bucket = (800, 1344)
    anchors_np = anchors_for_shape(bucket)
    n = anchors_np.shape[0]
    k = 1024
    max_det = 300
    thr = 0.05
    print(json.dumps({"anchors": int(n), "batch": batch, "classes": classes}))

    rng = np.random.RandomState(0)
    reg = jax.device_put(jnp.asarray(rng.randn(batch, n, 4) * 0.1, jnp.float32))
    cls = jax.device_put(jnp.asarray(
        rng.randn(batch, n, classes) * 1.5 - 4.5, jnp.float32))
    outputs = {"regression": reg, "classification": cls}

    def timeit(fn, *args):
        r = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(r)[0])
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                r = fn(*args)
            jax.device_get(jax.tree_util.tree_leaves(r)[0])
            times.append((time.perf_counter() - t0) / 4)
        return round(float(np.median(times)) * 1000, 2)

    results = {}

    def bench(name, fn, *args):
        results[name] = timeit(fn, *args)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)

    # --- sub-stages -------------------------------------------------------
    bench("decode_full", jax.jit(
        lambda o: decode_boxes(o["regression"], bucket)), outputs)

    @jax.jit
    def sigmoid_mask_t(o):
        s = jax.nn.sigmoid(o["classification"])
        m = jnp.where(s > thr, s, -jnp.inf)
        return jnp.transpose(m, (0, 2, 1))

    bench("sigmoid_mask_t", sigmoid_mask_t, outputs)

    masked = sigmoid_mask_t(outputs)
    for g in (8, 16, 32, 64):
        bench(f"topk_f32_g{g}", jax.jit(
            lambda m, g=g: exact_topk_lastdim(m, k, groups=g)), masked)
    masked_bf16 = masked.astype(jnp.bfloat16)
    bench("topk_bf16_g32", jax.jit(
        lambda m: exact_topk_lastdim(m, k, groups=32)), masked_bf16)

    boxes_full = jax.jit(lambda o: decode_boxes(o["regression"], bucket))(outputs)
    _, top_idx = jax.jit(lambda m: exact_topk_lastdim(m, k, groups=32))(masked)

    bench("gather_cand", jax.jit(
        lambda b_, i_: jnp.take_along_axis(
            b_[:, None, :, :], i_[..., None], axis=2)), boxes_full, top_idx)

    # --- full tails -------------------------------------------------------
    if not on_cpu:
        bench("tail_pallas", jax.jit(functools_partial(
            detections_from_outputs, image_shape_hw=bucket, use_pallas=True,
            deferred=False)), outputs)
    bench("tail_jnp", jax.jit(functools_partial(
        detections_from_outputs, image_shape_hw=bucket, use_pallas=False,
        deferred=False)), outputs)

    # --- deferred-decode tail (ops/nms.py batched_detections_deferred) ---
    from tdnet.ops.nms import batched_detections_deferred

    anchors_const = jnp.asarray(anchors_np, jnp.float32)

    def tail_deferred(o, topk_groups=32):
        return batched_detections_deferred(
            o["regression"], o["classification"], anchors_const, bucket,
            use_pallas=not on_cpu, pallas_interpret=on_cpu,
            topk_groups=topk_groups)

    for g in (16, 32, 64):
        bench(f"tail_deferred_g{g}", jax.jit(
            lambda o, g=g: tail_deferred(o, topk_groups=g)), outputs)

    # bf16 logits arm: model emits bf16, tail casts candidates to f32
    outputs_bf16 = {"regression": reg.astype(jnp.bfloat16),
                    "classification": cls.astype(jnp.bfloat16)}
    bench("tail_deferred_bf16_g32", jax.jit(
        lambda o: tail_deferred(o)), outputs_bf16)

    # --- exactness: deferred == current (also covered by
    # tests/ops/test_deferred_tail.py) -------------------------------------
    cur = jax.jit(functools_partial(
        detections_from_outputs, image_shape_hw=bucket,
        use_pallas=not on_cpu, deferred=False))(outputs)
    got = jax.jit(lambda o: tail_deferred(o))(outputs)
    same = {
        "boxes": bool(np.array_equal(np.asarray(cur.boxes), np.asarray(got.boxes))),
        "scores": bool(np.array_equal(np.asarray(cur.scores), np.asarray(got.scores))),
        "labels": bool(np.array_equal(np.asarray(cur.labels), np.asarray(got.labels))),
    }
    print(json.dumps({"deferred_exact": same}))
    return 0


def functools_partial(fn, **kw):
    import functools

    return functools.partial(fn, **kw)


if __name__ == "__main__":
    sys.exit(main())
