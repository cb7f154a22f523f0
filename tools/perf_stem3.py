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


import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import timed  # shared device_get-barrier methodology


def main():
    from tdnet.data.image import CAFFE_MEAN_BGR
    from tdnet.ops.pallas_stem import fused_stem_packed

    batch = int(os.environ.get("STEM3_BATCH", "32"))
    h, w = (int(v) for v in os.environ.get("STEM3_BUCKET", "800x1344").split("x"))
    tms = [int(v) for v in os.environ.get("STEM3_TM", "4").split(",")]

    r = np.random.RandomState(0)
    kernel7 = jnp.asarray(r.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32))
    scale = jnp.asarray(r.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(r.normal(0, 0.1, 64).astype(np.float32))
    mean = jnp.asarray(r.normal(0, 0.5, 64).astype(np.float32))
    var = jnp.asarray(r.uniform(0.5, 2.0, 64).astype(np.float32))
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    off = bias - mean * inv

    # jit-boundary form: packed (B, H, W*3) host views (the NHWC (B,H,W,3)
    # jit arg gets the padded 42x T(8,128) layout — round-3 measurement)
    x8 = jax.device_put(jnp.asarray(
        r.randint(0, 256, (batch, h, w * 3), np.uint8)))
    xf_nhwc = (r.randint(0, 256, (batch, h, w, 3)).astype(np.float32)
               - CAFFE_MEAN_BGR).astype(np.float32)
    xf = jax.device_put(jnp.asarray(xf_nhwc, jnp.bfloat16))  # NHWC for XLA
    xfp = jax.device_put(jnp.asarray(
        xf_nhwc.reshape(batch, h, w * 3), jnp.bfloat16))     # packed, pallas

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

    def pallas_float(tm):
        @jax.jit
        def fn(x):
            return fused_stem_packed(x, kernel7, inv, off, normalize=None,
                                     out_dtype=jnp.bfloat16, interpret=False,
                                     tm=tm)
        return fn

    def pallas_u8(tm, direct=False):
        @jax.jit
        def fn(x):
            return fused_stem_packed(x, kernel7, inv, off, normalize="caffe",
                                     out_dtype=jnp.bfloat16, interpret=False,
                                     tm=tm, direct=direct)
        return fn

    arms = [("xla_float", xla_float, xf)]
    for tm in tms:
        arms.append((f"pallas_u8[tm={tm}]", pallas_u8(tm), x8))
        arms.append((f"pallas_u8[tm={tm},direct]", pallas_u8(tm, True), x8))
    arms.append((f"pallas_float[tm={tms[0]}]", pallas_float(tms[0]), xfp))

    for name, fn, arg in arms:
        try:
            ms = timed(fn, arg)
            print(f"{name:22s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:22s} FAIL {str(e)[:300]}", flush=True)

    if os.environ.get("STEM3_CHECK", "1") != "1":
        return

    # on-device correctness: small batch (the batch-32 combined jit takes
    # many minutes to compile through the tunnel)
    nb = min(4, batch)

    @jax.jit
    def maxdiff(xa, xb):  # args, NOT closure constants (a closed-over
        # 100 MB batch gets baked into the HLO -> HTTP 413 at compile)
        a = xla_float(xa).astype(jnp.float32)
        b = pallas_float(tms[0])(xb).astype(jnp.float32)
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a))

    try:
        d, m = jax.device_get(maxdiff(xf[:nb], xfp[:nb]))
        print(f"max |xla - pallas| (float arm, batch {nb}) = {float(d):.4g}"
              f" (max |ref| {float(m):.4g})")
    except Exception as e:
        print("maxdiff FAIL", str(e)[:200])


if __name__ == "__main__":
    main()
