"""A/B: fused bottleneck-block Pallas kernel vs the XLA lowering, on-chip.

The round-4 verdict's one open perf item: an estimated 15-25% of backbone
headroom behind XLA's conv emitter on the stride-1 bottleneck bodies.
ops/pallas_block.py is the Mosaic-native attempt; this tool measures it at
the REAL stage shapes (batch 32, 800x1344 input -> stage2 200x336/64,
stage3 100x168/128, stage4 50x84/256, stage5 25x42/512), per identity
block and per stage (XLA numbers to beat, PERF.md re-measured table:
stage2 21.8 ms / stage3 14.4 / stage4 11.1 / stage5 5.1 — those include
one projection block each).

Run (on the TPU host):
    TDNET_TIMING_INNER=32 python tools/perf_block.py [--batch 32] [--tm 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import timed  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--tm", type=int, default=4)
    p.add_argument("--tms", type=str, default=None,
                   help="comma list of tm values to sweep (overrides --tm)")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--stages", default="2,3,4,5")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tdnet.ops.pallas_block import fused_bottleneck
    from tests.ops.test_pallas_block import xla_block

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    # (H, W, Cmid) per stage at 800x1344 input
    shapes = {
        2: (200, 336, 64),
        3: (100, 168, 128),
        4: (56, 88, 256),   # 50x84 padded to tile-friendly dims for the
        5: (32, 48, 512),   # sweep; real model H/W (50x84, 25x42) are NOT
    }                       # multiples of 8 -> see --real below
    real_shapes = {2: (200, 336, 64), 3: (104, 168, 128)}

    tms = ([int(t) for t in args.tms.split(",")]
           if args.tms else [args.tm])
    rng = np.random.default_rng(0)
    results = {}
    for stage in [int(s) for s in args.stages.split(",")]:
        h, w, m = shapes[stage]
        c = 4 * m
        b = args.batch
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), dt)
        w1 = jnp.asarray(rng.standard_normal((c, m)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, 3, m, m)) * 0.05, jnp.float32)
        w3 = jnp.asarray(rng.standard_normal((m, c)) * 0.05, jnp.float32)
        pr = {
            "i1": jnp.ones((m,), jnp.float32), "o1": jnp.zeros((m,), jnp.float32),
            "i2": jnp.ones((m,), jnp.float32), "o2": jnp.zeros((m,), jnp.float32),
            "i3": jnp.ones((c,), jnp.float32), "o3": jnp.zeros((c,), jnp.float32),
        }
        xla_fn = jax.jit(lambda x_, w1_, w2_, w3_: xla_block(
            x_, w1_, w2_, w3_, pr))
        t_xla = timed(xla_fn, x, w1, w2, w3)
        row = {"xla_ms": round(t_xla, 2)}
        for tm in tms:
            try:
                fn = jax.jit(lambda x_, w1_, w2_, w3_, tm=tm: fused_bottleneck(
                    x_, w1_, w2_, w3_, pr["i1"], pr["o1"], pr["i2"],
                    pr["o2"], pr["i3"], pr["o3"], tm=tm))
                # correctness spot-check on the first sample
                got = np.asarray(fn(x, w1, w2, w3), np.float32)
                ref = np.asarray(xla_fn(x, w1, w2, w3), np.float32)
                err = float(np.max(np.abs(got - ref))
                            / max(1e-6, float(np.max(np.abs(ref)))))
                t_fused = timed(fn, x, w1, w2, w3)
                row[f"fused_tm{tm}_ms"] = round(t_fused, 2)
                row[f"fused_tm{tm}_relerr"] = round(err, 6)
            except Exception as e:  # compile failure is a RESULT here
                row[f"fused_tm{tm}_ms"] = f"FAIL: {type(e).__name__}: {e}"[:200]
        results[f"stage{stage} ({b}x{h}x{w}x{c}, mid {m})"] = row
        print(json.dumps({f"stage{stage}": row}), flush=True)

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
