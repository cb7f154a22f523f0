"""Second stem experiment wave: what's the fastest exact 7x7/2 C=3 stem?

- plain: baseline conv
- pre_s2d: 4x4/1 conv on an ALREADY space-to-depth input (32,404,676,12)
  — the MLPerf formulation where the host pipeline emits s2d canvases, so
  the per-step rearrangement cost vanishes. This bounds the achievable win.
- pre_s2d_pad16: same but channels padded 12->16 on the host
- patches_dot: XLA im2col + one dot_general
- pad_c8: input channels zero-padded 3->8 for lane alignment
- f32: plain conv in f32 (rule out a slow bf16 C=3 path)
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

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    h, w, c, f = 800, 1344, 3, 64
    dtype = jnp.bfloat16
    dn = ("NHWC", "HWIO", "NHWC")

    rng = np.random.RandomState(0)
    kernel = jnp.asarray(rng.randn(7, 7, c, f) * 0.05, jnp.float32)
    x_np = rng.uniform(-120, 120, (batch, h, w, c)).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np, dtype))

    # host-side s2d (what the loader would emit): pad 4, 2x2 blocks->channels
    xp_np = np.pad(x_np, ((0, 0), (4, 4), (4, 4), (0, 0)))
    u_np = (xp_np.reshape(batch, (h + 8) // 2, 2, (w + 8) // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(batch, (h + 8) // 2, (w + 8) // 2, 4 * c))
    u = jax.device_put(jnp.asarray(u_np, dtype))
    u16 = jax.device_put(jnp.asarray(
        np.pad(u_np, ((0, 0), (0, 0), (0, 0), (0, 4))), dtype))

    def v8():
        return jnp.zeros((8, 8, c, f), jnp.float32).at[1:, 1:].set(kernel)

    def k4():
        return (v8().reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 4 * c, f))

    @jax.jit
    def plain(x):
        return jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=dn).astype(jnp.float32).sum()

    @jax.jit
    def pre_s2d(u):
        y = jax.lax.conv_general_dilated(
            u, k4().astype(dtype), (1, 1), "VALID", dimension_numbers=dn)
        return y[:, : h // 2, : w // 2, :].astype(jnp.float32).sum()

    @jax.jit
    def pre_s2d_pad16(u16):
        kk = jnp.pad(k4(), ((0, 0), (0, 0), (0, 4), (0, 0)))
        y = jax.lax.conv_general_dilated(
            u16, kk.astype(dtype), (1, 1), "VALID", dimension_numbers=dn)
        return y[:, : h // 2, : w // 2, :].astype(jnp.float32).sum()

    @jax.jit
    def patches_dot(x):
        p = jax.lax.conv_general_dilated_patches(
            x, (7, 7), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=dn)  # (B, H/2, W/2, 147) feature-major?
        kmat = kernel.transpose(2, 0, 1, 3).reshape(147, f)  # CHW-major features
        y = jax.lax.dot_general(
            p.astype(dtype), kmat.astype(dtype),
            (((3,), (0,)), ((), ())))
        return y.astype(jnp.float32).sum()

    @jax.jit
    def pad_c8(x):
        x8 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        k8 = jnp.pad(kernel, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return jax.lax.conv_general_dilated(
            x8, k8.astype(dtype), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=dn).astype(jnp.float32).sum()

    xf32 = jax.device_put(jnp.asarray(x_np, jnp.float32))

    @jax.jit
    def f32conv(xf32):
        return jax.lax.conv_general_dilated(
            xf32, kernel, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=dn).astype(jnp.float32).sum()

    def timeit(fn, arg):
        s = fn(arg)
        float(jax.device_get(s))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            for _ in range(4):
                s = fn(arg)
            float(jax.device_get(s))
            ts.append((time.perf_counter() - t0) / 4)
        return float(np.median(ts)) * 1000

    ref = float(jax.device_get(plain(x)))
    for name, fn, arg in [
        ("plain", plain, x),
        ("pre_s2d", pre_s2d, u),
        ("pre_s2d_pad16", pre_s2d_pad16, u16),
        ("patches_dot", patches_dot, x),
        ("pad_c8", pad_c8, x),
        ("f32", f32conv, xf32),
    ]:
        ms = timeit(fn, arg)
        val = float(jax.device_get(fn(arg)))
        print(json.dumps({"stem": name, "ms": round(ms, 2),
                          "rel_err": round(abs(val - ref) / abs(ref), 8)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
