"""Shared TPU timing helper for the perf tools.

Methodology (BASELINE.md "Timing methodology"): the axon-tunneled
platform's block_until_ready is NOT a completion barrier, so each sample
chains `inner` dispatches and fetches one reduced scalar (device_get is
the only reliable barrier); median over `iters` samples, reported in ms.
"""

from __future__ import annotations

import time

import numpy as np


def timed(fn, *args, iters: int = 10, inner: int = 4) -> float:
    """Median ms per call of fn(*args); result must be a jnp array (or a
    pytree — the first leaf is reduced for the barrier fetch)."""
    import jax
    import jax.numpy as jnp

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
