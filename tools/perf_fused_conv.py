"""Fused Pallas conv3+bn+residual+relu vs XLA unfused, per stage shape."""

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

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    dn = ("NHWC", "HWIO", "NHWC")
    shapes = [  # (H, W, K, N) for conv3 of stages 2..5 at 800x1344
        ("stage2", 200, 336, 64, 256),
        ("stage3", 100, 168, 128, 512),
        ("stage4", 50, 84, 256, 1024),
        ("stage5", 25, 42, 512, 2048),
    ]
    rng = np.random.RandomState(0)

    def timeit(fn, *args):
        # scalar barrier fetch + BENCH_INNER chaining: the old form
        # device_get'd the FULL output tensor per sample (hundreds of ms
        # of ~1.7 GB/s tunnel transfer amortized over inner=4) — see the
        # round-4 timing correction (tools/_timing.py, PERF.md)
        inner = int(os.environ.get("BENCH_INNER", "32"))

        def fetch(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            jax.device_get(jnp.sum(leaf.astype(jnp.float32)))

        fetch(fn(*args))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            for _ in range(inner):
                s = fn(*args)
            fetch(s)
            ts.append((time.perf_counter() - t0) / inner)
        return float(np.median(ts)) * 1000

    for name, h, w_, k, n in shapes:
        x = jax.device_put(jnp.asarray(
            rng.randn(batch, h, w_, k) * 0.5, jnp.bfloat16))
        kern = jnp.asarray(rng.randn(1, 1, k, n) * 0.05, jnp.float32)
        inv = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)
        off = jnp.asarray(rng.randn(n) * 0.1, jnp.float32)
        res = jax.device_put(jnp.asarray(
            rng.randn(batch, h, w_, n) * 0.5, jnp.bfloat16))

        @jax.jit
        def xla(x, res, kern=kern, inv=inv, off=off, k=k, n=n):
            y = jax.lax.conv_general_dilated(
                x, kern.astype(jnp.bfloat16), (1, 1), "VALID",
                dimension_numbers=dn)
            y = y * inv.astype(jnp.bfloat16) + off.astype(jnp.bfloat16)
            y = jnp.maximum(y + res, 0)
            return y.astype(jnp.float32).sum()

        @jax.jit
        def fused(x, res, kern=kern, inv=inv, off=off):
            y = fused_conv1x1(x, kern, inv, off, residual=res, relu=True)
            return y.astype(jnp.float32).sum()

        ms_xla = timeit(xla, x, res)
        ms_fused = timeit(fused, x, res)
        # numeric check
        v1 = float(jax.device_get(xla(x, res)))
        v2 = float(jax.device_get(fused(x, res)))
        print(json.dumps({
            "stage": name, "xla_ms": round(ms_xla, 2),
            "fused_ms": round(ms_fused, 2),
            "speedup": round(ms_xla / ms_fused, 2),
            "rel_err": round(abs(v1 - v2) / max(abs(v1), 1e-9), 6),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
