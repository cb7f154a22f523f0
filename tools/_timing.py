"""Shared TPU timing helper for the perf tools.

Methodology (BASELINE.md "Timing methodology"): the axon-tunneled
platform's block_until_ready is NOT a completion barrier, so each sample
chains `inner` dispatches and fetches one reduced scalar (device_get is
the only reliable barrier); median over `iters` samples, reported in ms.

BIAS NOTE (round-4 bandwidth study, tools/probe_bandwidth.py): the
barrier fetch costs a ~30-40 ms tunnel round trip PER SAMPLE, so the
reported per-op time is `true_op + RTT/inner`. At the old default
inner=4 that is a ~+8-10 ms ADDITIVE bias on every number — harmless for
A/B comparisons at equal inner, but it inflated absolute per-op numbers
enough to mis-diagnose the HBM roofline (~200-350 GB/s apparent vs
~670-810 GB/s true; PERF.md "HBM bandwidth study"). Default inner is now
16 (override: TDNET_TIMING_INNER); use 32+ for single-digit-ms ops.
"""

from __future__ import annotations

import os
import time

import numpy as np

def timed(fn, *args, iters: int = 10, inner: int | None = None) -> float:
    """Median ms per call of fn(*args); result must be a jnp array (or a
    pytree — the first leaf is reduced for the barrier fetch).
    Reported value carries a +RTT/inner additive bias (see module note).

    inner=None resolves TDNET_TIMING_INNER at CALL time (default 16) —
    binding it at import time silently ignored env changes made after any
    transitive import of this module (round-4 ADVICE)."""
    import jax
    import jax.numpy as jnp

    if inner is None:
        inner = int(os.environ.get("TDNET_TIMING_INNER", "16"))

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(jnp.sum(leaf.astype(jnp.float32)))

    out = fn(*args)
    fetch(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        fetch(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts)) * 1000
