"""Find peak Pallas DMA bandwidth: copy-kernel block-shape sweep.

XLA elementwise passes run at ~750 GB/s on this v5e; the first Pallas copy
kernel measured ~254 GB/s. Sweep block shapes/aspects to find what Mosaic
pipelines well. Also an XLA copy baseline.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n = 32 * 200 * 336, 256  # 2.15M x 256 bf16 = 1.38 GB
    rng = np.random.RandomState(0)
    res = jax.device_put(jnp.asarray(rng.randn(m, n) * 0.5, jnp.bfloat16))
    gb = m * n * 2 * 2 / 1e9

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

    @jax.jit
    def xla_copy(x):
        return x + jnp.bfloat16(1.0)

    ms = timeit(xla_copy, res)
    print(json.dumps({"variant": "xla_add1", "ms": round(ms, 2),
                      "GBps": round(gb / ms * 1000, 0)}))

    def copy_kernel(r_ref, o_ref):
        o_ref[:] = r_ref[:]

    def pallas_copy(x, shape2d, tm, tn):
        mm, nn = shape2d
        spec = pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel, grid=(mm // tm, nn // tn),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((mm, nn), jnp.bfloat16),
        )(x.reshape(mm, nn))

    total = m * n
    for mm, nn, tm, tn in [
        (m, 256, 2048, 256),
        (m, 256, 8192, 256),
        (m, 256, 16384, 256),
        (total // 512, 512, 4096, 512),
        (total // 1024, 1024, 2048, 1024),
        (total // 2048, 2048, 1024, 2048),
        (total // 8192, 8192, 256, 8192),
        (total // 1024, 1024, 8192, 1024),
    ]:
        try:
            fn = jax.jit(lambda x, mm=mm, nn=nn, tm=tm, tn=tn:
                         pallas_copy(x, (mm, nn), tm, tn))
            ms = timeit(fn, res)
            print(json.dumps({"variant": f"pallas_{mm}x{nn}_t{tm}x{tn}",
                              "ms": round(ms, 2),
                              "GBps": round(gb / ms * 1000, 0)}))
        except Exception as e:
            print(json.dumps({"variant": f"pallas_{mm}x{nn}_t{tm}x{tn}",
                              "error": str(e)[:90]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
