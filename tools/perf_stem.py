"""Head-to-head stem variants on TPU, one process (controls run variance):
plain 7x7/2, s2d 2x2 (current StemConv), direct 8x8/2 padded-kernel, and
s2d with the transpose replaced by a strided-slice concat."""

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

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    h, w, c, f = 800, 1344, 3, 64
    dtype = jnp.bfloat16

    rng = np.random.RandomState(0)
    kernel = jnp.asarray(rng.randn(7, 7, c, f) * 0.05, jnp.float32)
    x = jax.device_put(jnp.asarray(
        rng.uniform(-120, 120, (batch, h, w, c)), dtype))

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def plain(x):
        return jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=dn,
        ).astype(jnp.float32).sum()

    def v8():
        return jnp.zeros((8, 8, c, f), jnp.float32).at[1:, 1:].set(kernel)

    @jax.jit
    def direct8(x):
        return jax.lax.conv_general_dilated(
            x, v8().astype(dtype), (2, 2), ((4, 3), (4, 3)),
            dimension_numbers=dn,
        ).astype(jnp.float32).sum()

    @jax.jit
    def s2d_transpose(x):
        k4 = (v8().reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 4 * c, f))
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        b, hp, wp, _ = xp.shape
        u = (xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c))
        y = jax.lax.conv_general_dilated(
            u, k4.astype(dtype), (1, 1), "VALID", dimension_numbers=dn)
        return y[:, : h // 2, : w // 2, :].astype(jnp.float32).sum()

    @jax.jit
    def s2d_slices(x):
        # space-to-depth via 4 strided slices + concat (no 6-D transpose)
        k4 = (v8().reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 4 * c, f))
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        u = jnp.concatenate([
            xp[:, ph::2, pw::2, :]
            for ph in (0, 1) for pw in (0, 1)
        ], axis=-1)
        # channel order here is (ph*2+pw) blocks of C — matches k4
        y = jax.lax.conv_general_dilated(
            u, k4.astype(dtype), (1, 1), "VALID", dimension_numbers=dn)
        return y[:, : h // 2, : w // 2, :].astype(jnp.float32).sum()

    def timeit(fn):
        s = fn(x)
        float(jax.device_get(s))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            for _ in range(4):
                s = fn(x)
            float(jax.device_get(s))
            ts.append((time.perf_counter() - t0) / 4)
        return float(np.median(ts)) * 1000

    ref = None
    for name, fn in [("plain7x7", plain), ("direct8x8", direct8),
                     ("s2d_transpose", s2d_transpose),
                     ("s2d_slices", s2d_slices)]:
        ms = timeit(fn)
        val = float(jax.device_get(fn(x)))
        if ref is None:
            ref = val
        print(json.dumps({"stem": name, "ms": round(ms, 2),
                          "rel_err": round(abs(val - ref) / abs(ref), 8)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
