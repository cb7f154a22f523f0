"""Tile-size sweep for the fused conv1x1 kernel on the worst shape (stage2)."""

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

    from tdnet.ops.pallas_conv import fused_conv1x1

    batch = 32
    shapes = [("stage2", 200, 336, 64, 256), ("stage3", 100, 168, 128, 512)]
    rng = np.random.RandomState(0)

    def timeit(fn, *args):
        s = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(s)[0])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                s = fn(*args)
            jax.device_get(jax.tree_util.tree_leaves(s)[0])
            ts.append((time.perf_counter() - t0) / 4)
        return float(np.median(ts)) * 1000

    for name, h, w_, k, n in shapes:
        x = jax.device_put(jnp.asarray(
            rng.randn(batch, h, w_, k) * 0.5, jnp.bfloat16))
        kern = jnp.asarray(rng.randn(1, 1, k, n) * 0.05, jnp.float32)
        inv = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)
        off = jnp.asarray(rng.randn(n) * 0.1, jnp.float32)
        res = jax.device_put(jnp.asarray(
            rng.randn(batch, h, w_, n) * 0.5, jnp.bfloat16))

        for tm in (512, 1024, 2048, 4096, 8192):
            for tn in (128, 256, min(512, n)):
                def fused(x, res, tm=tm, tn=tn):
                    y = fused_conv1x1(x, kern, inv, off, residual=res,
                                      relu=True, tile_m=tm, tile_n=tn)
                    return y.astype(jnp.float32).sum()
                fused = jax.jit(fused)
                try:
                    ms = timeit(fused, x, res)
                except Exception as e:
                    print(json.dumps({"stage": name, "tm": tm, "tn": tn,
                                      "error": str(e)[:80]}))
                    continue
                print(json.dumps({"stage": name, "tm": tm, "tn": tn,
                                  "ms": round(ms, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
