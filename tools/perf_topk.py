"""Sweep the exact two-stage top-k group count + score dtype on TPU."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main() -> int:
    import functools

    import jax
    import jax.numpy as jnp

    batch, classes, n, k = 32, 1, 201600, 1024
    rng = np.random.RandomState(0)
    base = rng.randn(batch, classes, n) * 1.5 - 4.5

    def timeit(fn, x):
        r = fn(x)
        jax.device_get(jax.tree_util.tree_leaves(r)[0])
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                r = fn(x)
            jax.device_get(jax.tree_util.tree_leaves(r)[0])
            times.append((time.perf_counter() - t0) / 4)
        return float(np.median(times)) * 1000

    @jax.jit
    def single(x):
        return jax.lax.top_k(x, k)

    @functools.partial(jax.jit, static_argnames=("g",))
    def twostage(x, g):
        nn_ = x.shape[-1]
        pad = (-nn_) % g
        m = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), constant_values=-jnp.inf)
        m = m.reshape(batch, classes, g, -1)
        sv, si = jax.lax.top_k(m, k)
        base_ = (jnp.arange(g, dtype=jnp.int32) * m.shape[-1])[None, None, :, None]
        si = si + base_
        sv = sv.reshape(batch, classes, g * k)
        si = si.reshape(batch, classes, g * k)
        fv, fi = jax.lax.top_k(sv, k)
        return fv, jnp.take_along_axis(si, fi, axis=-1)

    for dt in (jnp.float32, jnp.bfloat16):
        x = jax.device_put(jnp.asarray(base, dt))
        name = "f32" if dt == jnp.float32 else "bf16"
        print(json.dumps({"single_topk": name, "ms": round(timeit(single, x), 2)}))
        ref_v, _ = jax.device_get(single(x))
        for g in (4, 8, 16, 32, 64):
            fn = lambda xx, g=g: twostage(xx, g)
            ms = timeit(fn, x)
            v, _ = jax.device_get(fn(x))
            print(json.dumps({"twostage": name, "g": g, "ms": round(ms, 2),
                              "exact": bool(np.array_equal(v, ref_v))}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
