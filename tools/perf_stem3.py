"""Round-3 stem study: fused ingest+stem Pallas kernel vs the XLA stem.

Times the stem segment (conv 7x7/2 + frozen BN + ReLU + maxpool 3x3/2) at
the product bucket. Arms:

  xla_float    : XLA stem on prenormalized bf16 input (round-2 floor ~16.5ms
                 at batch 32 — measured on the f32 input then; bf16 here)
  pallas_float : fused_stem on prenormalized bf16 input
  pallas_u8    : fused_stem on raw uint8 (ingestion folded in — the
                 config-2 path; no (B,H,W,3) float tensor ever exists)

Outputs land as (B, H/4, W/4, 64) bf16 in all arms.

Run:  STEM3_BATCH=32 python tools/perf_stem3.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10, inner=4):
    out = fn(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts)) * 1000


def main():
    from tdnet.data.image import CAFFE_MEAN_BGR
    from tdnet.ops.pallas_stem import fused_stem

    batch = int(os.environ.get("STEM3_BATCH", "32"))
    h, w = (int(v) for v in os.environ.get("STEM3_BUCKET", "800x1344").split("x"))
    tm = int(os.environ.get("STEM3_TM", "10"))

    r = np.random.RandomState(0)
    kernel7 = jnp.asarray(r.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32))
    scale = jnp.asarray(r.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(r.normal(0, 0.1, 64).astype(np.float32))
    mean = jnp.asarray(r.normal(0, 0.5, 64).astype(np.float32))
    var = jnp.asarray(r.uniform(0.5, 2.0, 64).astype(np.float32))
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    off = bias - mean * inv

    x8 = jax.device_put(jnp.asarray(
        r.randint(0, 256, (batch, h, w, 3), np.uint8)))
    xf = jax.device_put(jnp.asarray(
        (r.randint(0, 256, (batch, h, w, 3)).astype(np.float32)
         - CAFFE_MEAN_BGR).astype(jnp.bfloat16)))

    @jax.jit
    def xla_float(x):
        y = jax.lax.conv_general_dilated(
            x, kernel7.astype(jnp.bfloat16), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y * inv.astype(jnp.bfloat16) + off.astype(jnp.bfloat16)
        y = jnp.maximum(y, 0)
        from flax import linen as nn

        return nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")

    @jax.jit
    def pallas_float(x):
        return fused_stem(x, kernel7, inv, off, normalize=None,
                          out_dtype=jnp.bfloat16, interpret=False, tm=tm)

    @jax.jit
    def pallas_u8(x):
        return fused_stem(x, kernel7, inv, off, normalize="caffe",
                          out_dtype=jnp.bfloat16, interpret=False, tm=tm)

    for name, fn, arg in (
        ("xla_float", xla_float, xf),
        ("pallas_float", pallas_float, xf),
        ("pallas_u8", pallas_u8, x8),
    ):
        try:
            ms = timed(fn, arg)
            print(f"{name:13s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:13s} FAIL {str(e)[:200]}", flush=True)

    @jax.jit
    def maxdiff():
        a = xla_float(xf).astype(jnp.float32)
        b = pallas_float(xf).astype(jnp.float32)
        return jnp.max(jnp.abs(a - b))

    print("max |xla - pallas| (float arm) =", float(jax.device_get(maxdiff())))


if __name__ == "__main__":
    main()
