"""Diagnose the Pallas matmul bandwidth gap: copy-only vs dot-only vs
dot+residual at the stage2 shape (M=2.15M, K=64, N=256)."""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k, n = 32 * 200 * 336, 64, 256
    tm, tn = 2048, 256
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(rng.randn(m, k) * 0.5, jnp.bfloat16))
    w = jax.device_put(jnp.asarray(rng.randn(k, n) * 0.05, jnp.bfloat16))
    res = jax.device_put(jnp.asarray(rng.randn(m, n) * 0.5, jnp.bfloat16))

    grid = (m // tm,)
    x_spec = pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mn_spec = pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def copy_kernel(r_ref, o_ref):
        o_ref[:] = r_ref[:]

    @jax.jit
    def copy_only(res):
        return pl.pallas_call(
            copy_kernel, grid=grid, in_specs=[mn_spec], out_specs=mn_spec,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        )(res)

    def dot_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    @jax.jit
    def dot_only(x, w):
        return pl.pallas_call(
            dot_kernel, grid=grid, in_specs=[x_spec, w_spec],
            out_specs=mn_spec,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        )(x, w)

    def dotres_kernel(x_ref, w_ref, r_ref, o_ref):
        acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = jnp.maximum(acc.astype(jnp.bfloat16) + r_ref[:], 0)

    def dotres(x, w, res, semantics):
        params = (
            pltpu.CompilerParams(dimension_semantics=semantics)
            if semantics else None
        )
        kw = {"compiler_params": params} if params else {}
        return pl.pallas_call(
            dotres_kernel, grid=grid, in_specs=[x_spec, w_spec, mn_spec],
            out_specs=mn_spec,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            **kw,
        )(x, w, res)

    @jax.jit
    def xla_ref(x, w, res):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return jnp.maximum(y.astype(jnp.bfloat16) + res, 0)

    def timeit(fn, *args):
        o = fn(*args)
        jax.device_get(o[:1, :1])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                o = fn(*args)
            jax.device_get(o[:1, :1])
            ts.append((time.perf_counter() - t0) / 4)
        return float(np.median(ts)) * 1000

    gb = (m * n * 2 * 2) / 1e9  # res read + out write
    print(json.dumps({"copy_only_ms": round(timeit(copy_only, res), 2),
                      "ideal_ms_at_819GBs": round(gb / 0.819, 2)}))
    print(json.dumps({"dot_only_ms": round(timeit(dot_only, x, w), 2)}))
    print(json.dumps({"dotres_default_ms": round(
        timeit(jax.jit(lambda a, b, c: dotres(a, b, c, None)), x, w, res), 2)}))
    print(json.dumps({"dotres_arbitrary_ms": round(
        timeit(jax.jit(lambda a, b, c: dotres(a, b, c, ("arbitrary",))),
               x, w, res), 2)}))
    print(json.dumps({"xla_matmul_add_relu_ms": round(
        timeit(xla_ref, x, w, res), 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
