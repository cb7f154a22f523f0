"""Train-step decomposition on TPU: forward+loss vs full step (bwd+Adam),
plus the target-assignment cost, at the config-3 shapes."""

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
    from tdnet.ops.anchors import anchors_for_shape
    from tdnet.ops.losses import focal, smooth_l1
    from tdnet.ops.targets import batched_anchor_targets
    from tdnet.train.step import create_train_state, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    bucket = (800, 1344)
    model = RetinaNet(num_classes=1, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1,) + bucket + (3,)
    )

    rng = np.random.RandomState(0)
    m = 8
    batch_data = {
        "images": jax.device_put(jnp.asarray(
            rng.uniform(-116, 139, (batch,) + bucket + (3,)), jnp.float32)),
        "gt_boxes": jax.device_put(jnp.asarray(
            np.tile(np.array([[100, 100, 600, 500]], np.float32),
                    (batch, m, 1)))),
        "gt_labels": jnp.zeros((batch, m), jnp.int32),
        "gt_mask": jnp.asarray(
            np.tile(np.arange(m) < 3, (batch, 1))),
        "image_hw": jnp.tile(jnp.asarray(
            [bucket[0], bucket[1]], jnp.float32), (batch, 1)),
    }

    anchors = jnp.asarray(anchors_for_shape(bucket), jnp.float32)
    focal_fn = focal(from_logits=True)
    l1_fn = smooth_l1()

    @jax.jit
    def targets_only(b):
        labels, regression = batched_anchor_targets(
            anchors, b["gt_boxes"], b["gt_labels"], b["gt_mask"],
            b["image_hw"], 1)
        return labels.sum() + regression.sum()

    @jax.jit
    def fwd_loss(params, batch_stats, b):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          b["images"])
        labels, regression = batched_anchor_targets(
            anchors, b["gt_boxes"], b["gt_labels"], b["gt_mask"],
            b["image_hw"], 1)
        return focal_fn(labels, out["classification"]) + l1_fn(
            regression, out["regression"])

    train_step = make_train_step(model, num_classes=1)

    def timeit(fn, *args, fetch=lambda r: r):
        r = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(fetch(r))[0])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                r = fn(*args)
            jax.device_get(jax.tree_util.tree_leaves(fetch(r))[0])
            ts.append((time.perf_counter() - t0) / 4)
        return float(np.median(ts)) * 1000

    ms_t = timeit(targets_only, batch_data)
    print(json.dumps({"stage": "targets_only", "ms": round(ms_t, 2)}))
    ms_f = timeit(fwd_loss, state.params, state.batch_stats, batch_data)
    print(json.dumps({"stage": "forward+targets+loss", "ms": round(ms_f, 2)}))

    # full step: state is donated inside make_train_step -> rebuild each call
    # chain via the returned state instead
    def chain_step(state, b):
        return train_step(state, b)

    s = state
    s, metrics = chain_step(s, batch_data)
    jax.device_get(metrics["loss"])
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(4):
            s, metrics = chain_step(s, batch_data)
        jax.device_get(metrics["loss"])
        ts.append((time.perf_counter() - t0) / 4)
    ms_full = float(np.median(ts)) * 1000
    print(json.dumps({"stage": "full_step(fwd+bwd+adam)",
                      "ms": round(ms_full, 2),
                      "imgs_per_s": round(batch / ms_full * 1000, 1)}))
    print(json.dumps({"delta_backward_adam_ms": round(ms_full - ms_f, 2),
                      "batch": batch}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
