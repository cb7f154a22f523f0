"""Measure uint8 ingestion on the real TPU: XLA lowering vs Pallas kernel.

METHODOLOGY NOTE (round-3 finding): a standalone jit whose OUTPUT is
(B, H, W, 3) gets a pathological TPU layout — XLA tiles the last two dims
(W, C) as T(8,128), padding C=3 to 128 lanes, a 42x physical blowup (batch
32 f32 logically 413 MB allocates 17.6 GB and OOMs). Any microbench timed
on such boundary shapes measures the padded-layout traffic, not the op.
This tool therefore times the op on the (R, 3072) byte-matrix view the
kernel actually uses; the authoritative product number is end-to-end
`BENCH_FUSED=1 python bench.py`, where the normalize feeds the stem conv
inside one jit.

Run:  INGEST_BATCH=32 python tools/perf_ingest.py
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
    from tdnet.ops.pallas_ingest import _ROW, normalize_uint8

    batch = int(os.environ.get("INGEST_BATCH", "32"))
    h, w = (int(v) for v in os.environ.get("INGEST_BUCKET", "800x1344").split("x"))
    out_dt = jnp.bfloat16 if os.environ.get("INGEST_OUT", "bf16") == "bf16" else jnp.float32
    itemsize = 2 if out_dt == jnp.bfloat16 else 4
    rows = batch * h * w * 3 // _ROW
    nbytes_out = rows * _ROW * itemsize

    x8 = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (rows, _ROW), np.uint8)))
    xf = jax.device_put(jnp.asarray(
        np.random.RandomState(1).uniform(-116, 139, (rows, _ROW)).astype(np.float32)))
    mean_row = jnp.asarray(np.tile(np.asarray(CAFFE_MEAN_BGR, np.float32),
                                   _ROW // 3))

    @jax.jit
    def xla_u8(x):
        return (x.astype(jnp.float32) - mean_row).astype(out_dt)

    @jax.jit
    def pallas_u8(x):
        return normalize_uint8(
            x.reshape(batch, h, w, 3), "caffe", out_dtype=out_dt,
            interpret=False,
        ).reshape(rows, _ROW)

    @jax.jit
    def f32_copy(x):
        return (x - mean_row).astype(out_dt)

    for name, fn, arg in (
        ("xla_u8", xla_u8, x8),
        ("pallas_u8", pallas_u8, x8),
        ("f32_copy", f32_copy, xf),
    ):
        ms = timed(fn, arg)
        in_bytes = arg.nbytes
        gbps = (in_bytes + nbytes_out) / (ms / 1000) / 1e9
        print(f"{name:10s} {ms:8.2f} ms   {gbps:7.1f} GB/s "
              f"(in {in_bytes/1e6:.0f} MB out {nbytes_out/1e6:.0f} MB)",
              flush=True)

    # parity check on-device (reduce there; fetch one scalar via the tunnel)
    @jax.jit
    def maxdiff(x):
        a = xla_u8(x).astype(jnp.float32)
        b = pallas_u8(x).astype(jnp.float32)
        return jnp.max(jnp.abs(a - b))

    print("max |xla - pallas| =", float(jax.device_get(maxdiff(x8))))


if __name__ == "__main__":
    main()
