"""HBM bandwidth probe: root-cause the round-3 "3x gap" (VERDICT weak #2).

PERF.md's roofline argument rests on a MEASURED ~200-350 GB/s effective
HBM rate — ~1/3 of the v5e datasheet's 819 GB/s — with no explanation.
If that bandwidth is recoverable, the "stage2/3 are AT roofline, ~273
img/s is the ceiling" claim is wrong by a large factor. This probe
separates the candidate mechanisms:

- **steady-state vs dispatch**: every op runs inside one jitted
  `lax.scan` over K iterations (carry-dependent, so XLA cannot hoist or
  fold the loop), so per-dispatch/tunnel overhead is amortized to zero;
  the same op is also timed as a single dispatch to expose the per-call
  overhead the axon tunnel adds.
- **op shapes**: elementwise scale (2 bytes moved per byte of operand:
  read+write), nonlinear reduce (read-only), transpose (read+write,
  permuted writes), a Pallas block copy (read+write through VMEM,
  bypassing XLA's fusion choices), uint8 elementwise (the ingest path's
  dtype), and bf16 scale.
- **size sweep**: 16 MB -> 512 MB footprints — small sizes expose
  latency/occupancy limits, large sizes the true streaming rate.
- **host->device**: device_put of pinned numpy, the tunnel transfer rate
  (NOT HBM; listed so ingest numbers have context).

Per-op model of bytes moved is printed with each rate so the numbers are
auditable. Run on the real chip (no JAX_PLATFORMS override):

    JAX_COMPILATION_CACHE_DIR=/tmp/tdnet_jax_cache \
    python tools/probe_bandwidth.py [--sizes-mb 16 128 512] [--iters 64]

Writes artifacts/probe_bandwidth.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, *args, reps: int = 5) -> float:
    """Time with a dependent-scalar readback barrier.

    On the axon tunnel `block_until_ready` is NOT a completion barrier
    (tools/_timing.py methodology note — a first draft of this probe
    used it and measured petabytes/sec). Each sample therefore fetches
    jnp.sum of the output, which forces execution; the sum adds one read
    of the output (accounted in callers' byte models where it is not
    negligible) plus the tunnel round-trip (reported separately as
    `fetch_rtt`)."""
    import jax
    import jax.numpy as jnp

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(jnp.sum(leaf.astype(jnp.float32)))

    fetch(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes-mb", type=int, nargs="+", default=[16, 128, 512])
    p.add_argument("--iters", type=int, default=64,
                   help="scan length K (steady-state loop)")
    p.add_argument("--out", default="artifacts/probe_bandwidth.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    K = args.iters
    results = []

    # tunnel round-trip of the barrier fetch itself: the floor every
    # sample pays; small-footprint rows are RTT-bound, not HBM-bound
    tiny = jnp.ones((8, 128), jnp.float32)
    rtt = _timed(lambda t: t * 2.0, tiny)
    print(f"fetch RTT (dispatch + scalar readback): {rtt * 1e3:.2f} ms")

    def record(name, size_mb, dtype, bytes_moved, seconds, note=""):
        gbs = bytes_moved / seconds / 1e9
        # RTT-corrected: the measured sample includes one ~33 ms tunnel
        # round-trip (dispatch + scalar readback); subtracting it gives
        # the on-chip rate. Only meaningful when compute dominates.
        corr = (bytes_moved / (seconds - rtt) / 1e9
                if seconds > 2 * rtt else None)
        row = {"op": name, "footprint_mb": size_mb, "dtype": str(dtype),
               "gb_per_s": round(gbs, 1),
               "gb_per_s_rtt_corrected": round(corr, 1) if corr else None,
               "seconds": round(seconds, 6),
               "bytes_moved": int(bytes_moved), "note": note}
        results.append(row)
        c = f"(corr {corr:7.1f})" if corr else "(RTT-bound)"
        print(f"{name:28s} {size_mb:5d} MB {str(dtype):9s} "
              f"{gbs:8.1f} GB/s {c}  {note}")

    for size_mb in args.sizes_mb:
        nbytes = size_mb * 1024 * 1024
        rows = nbytes // (1024 * 4)
        x32 = jnp.asarray(
            np.random.RandomState(0).rand(rows, 1024).astype(np.float32))
        cs32 = jnp.full((K,), np.float32(1.0 + 2 ** -20))

        # ---- steady-state elementwise scale: K x (read N + write N)
        @jax.jit
        def scale_scan(y, cs):
            return jax.lax.scan(lambda y, c: (y * c, None), y, cs)[0]

        # byte models: +nbytes everywhere for the barrier's sum read
        t = _timed(scale_scan, x32, cs32)
        record("scale f32 (scan)", size_mb, "float32",
               K * 2 * nbytes + nbytes, t)

        # ---- single dispatch of the same op: exposes per-call overhead
        @jax.jit
        def scale_once(y, c):
            return y * c

        t1 = _timed(scale_once, x32, cs32[0])
        record("scale f32 (1 dispatch)", size_mb, "float32", 3 * nbytes, t1,
               note=f"per-call overhead ~{max(0.0, t1 - t / K) * 1e3:.2f} ms")

        # ---- read-only nonlinear reduce: K x read N (abs(x-c) defeats
        # algebraic hoisting; the carry is the running scalar sum)
        @jax.jit
        def reduce_scan(x, cs):
            return jax.lax.scan(
                lambda s, c: (s + jnp.sum(jnp.abs(x - c)), None),
                jnp.float32(0.0), cs)[0]

        t = _timed(reduce_scan, x32, cs32)
        record("reduce f32 (scan, read-only)", size_mb, "float32",
               K * nbytes, t)

        # ---- transpose: K x (read N + permuted write N), square matrix
        n_sq = int(np.sqrt(nbytes / 4))
        n_sq -= n_sq % 256
        xsq = jnp.asarray(
            np.random.RandomState(1).rand(n_sq, n_sq).astype(np.float32))

        @jax.jit
        def transpose_scan(y, cs):
            return jax.lax.scan(lambda y, c: ((y * c).T, None), y, cs)[0]

        sq_bytes = n_sq * n_sq * 4
        t = _timed(transpose_scan, xsq, cs32)
        record("transpose f32 (scan)", round(sq_bytes / 2 ** 20), "float32",
               K * 2 * sq_bytes + sq_bytes, t, note=f"{n_sq}x{n_sq}")

        # ---- bf16 scale: same elementwise loop at half the bytes/elem
        xb = x32.astype(jnp.bfloat16)
        csb = cs32.astype(jnp.bfloat16)
        t = _timed(scale_scan, xb, csb)
        record("scale bf16 (scan)", size_mb // 2, "bfloat16",
               K * nbytes + nbytes // 2, t)

        # ---- uint8 elementwise add (the ingest dtype): K x (read+write)
        xu = jnp.asarray(np.random.RandomState(2).randint(
            0, 255, (rows, 1024), np.uint8))
        csu = jnp.ones((K,), jnp.uint8)

        @jax.jit
        def add_scan_u8(y, cs):
            return jax.lax.scan(lambda y, c: (y + c, None), y, cs)[0]

        t = _timed(add_scan_u8, xu, csu)
        record("add uint8 (scan)", size_mb // 4, "uint8",
               K * 2 * (nbytes // 4) + nbytes // 4, t)

        # ---- Pallas block copy: read+write through VMEM, no XLA fusion
        try:
            from jax.experimental import pallas as pl

            def _copy_kernel(x_ref, o_ref):
                o_ref[...] = x_ref[...]

            block_rows = 512
            grid = rows // block_rows

            def pallas_copy(y):
                return pl.pallas_call(
                    _copy_kernel,
                    out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
                    grid=(grid,),
                    in_specs=[pl.BlockSpec(
                        (block_rows, 1024), lambda i: (i, 0))],
                    out_specs=pl.BlockSpec(
                        (block_rows, 1024), lambda i: (i, 0)),
                )(y)

            @jax.jit
            def pallas_scan(y, cs):
                # carry-dependent: iteration k copies iteration k-1's out
                return jax.lax.scan(
                    lambda y, c: (pallas_copy(y * c), None), y, cs)[0]

            t = _timed(pallas_scan, x32, cs32)
            # y*c then copy: read N + write N (fused scale) + read N +
            # write N (kernel) = 4N per iteration
            record("pallas copy+scale f32 (scan)", size_mb, "float32",
                   K * 4 * nbytes + nbytes, t)
        except Exception as exc:
            print(f"pallas copy skipped: {type(exc).__name__}: {exc}")

        # ---- host->device: the tunnel/PCIe rate, NOT HBM
        host = np.random.RandomState(3).rand(rows, 1024).astype(np.float32)
        t = _timed(lambda h: jax.device_put(h), host, reps=3)
        record("host->device device_put", size_mb, "float32", nbytes, t,
               note="tunnel transfer, not HBM")

    peak = max(r["gb_per_s_rtt_corrected"] or r["gb_per_s"]
               for r in results
               if "host" not in r["op"] and "dispatch" not in r["op"])
    summary = {
        "device": dev.device_kind,
        "fetch_rtt_s": round(rtt, 4),
        "peak_on_chip_gb_s": peak,
        "datasheet_v5e_gb_s": 819,
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\npeak on-chip streaming rate observed: {peak} GB/s "
          f"(datasheet v5e: 819) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
