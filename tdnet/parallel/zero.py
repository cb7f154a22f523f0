"""ZeRO-1: shard Adam moments over the data axis, params stay replicated.

The reference has no ZeRO/FSDP anything (SURVEY.md §2.4 lists the family
among its explicit absences); this completes tdnet's beyond-parity
parallelism set (data / spatial / tensor / pipeline / ZeRO-1).

Where tensor parallelism (parallel/tensor.py) divides weight AND optimizer
memory at the cost of per-conv channel collectives, ZeRO-1 divides ONLY
the optimizer state — the cheap 2/3 of the per-param training footprint
(Adam mu+nu are 2 f32 tensors per f32 param) — at the cost of one
all-gather of the param UPDATE per step, and composes with plain data
parallelism on the 1-D data mesh the product already uses:

- Mesh: the ordinary 1-D ('data',) mesh (parallel/mesh.py). Params,
  batch_stats, step: replicated, exactly as in plain DP.
- Optimizer state: every Adam moment (mu/nu — they mirror the param tree
  key-for-key) whose last dim is wide enough and divisible by the axis is
  placed P(..., 'data') — each device owns 1/N of the moments. Counts,
  injected hyperparams, and narrow leaves stay replicated.
- Collectives, all GSPMD-inserted: gradients all-reduce over 'data' as in
  plain DP (replicated after psum); the moment update (b·m + (1-b)·g) is
  elementwise on a sharded operand, so each device updates only its
  slice; the Adam step mu_hat/(sqrt(nu_hat)+eps) is likewise sharded; the
  final params = params - lr·update all-gathers the UPDATE (not the
  moments) to produce replicated new params. That all-gather is the whole
  price — same volume as one more gradient all-reduce.
- The output shardings are PINNED via jit out_shardings
  (train/step.py make_train_step(state_out_shardings=...)): without the
  pin the partitioner is free to emit sharded params (correct but
  FSDP-ish semantics that would re-gather at every use); with it the
  moments stay sharded and the params stay replicated across steps
  (asserted in tests/parallel/test_zero.py).

Numerics are EXACTLY the plain-DP step's (same graph, different
placement) — equivalence asserted leaf-for-leaf. Train CLI: `--zero`.
Composition: built for the 1-D data mesh (incl. multi-host, where each
host's devices hold moment shards); combine with --tensor-parallel is
redundant (TP already shards the moments), with --spatial unsupported.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdnet.parallel.mesh import DATA_AXIS

__all__ = [
    "MIN_SHARDED_SIZE",
    "moment_partition_spec",
    "zero_state_shardings",
    "shard_state_zero",
]

# Moment leaves narrower than this stay replicated: sharding a 36-element
# head-bias moment saves nothing and costs layout churn. Conv-kernel
# moments (last dim 64-2048) and tower bias/BN moments (256) shard.
MIN_SHARDED_SIZE = 64


def _entry_name(entry):
    for attr in ("key", "name"):
        v = getattr(entry, attr, None)
        if isinstance(v, str):
            return v
    return None


def moment_partition_spec(path, leaf, n_data: int,
                          min_size: int = MIN_SHARDED_SIZE) -> P:
    """PartitionSpec for one TrainState leaf under ZeRO-1.

    Sharded iff the leaf lives under an Adam moment — inside the
    TrainState's `opt_state` subtree AND under a 'mu'/'nu' key (optax
    ScaleByAdamState fields) — and its last dim is wide enough and
    divisible by the data axis; everything else replicated. The opt_state
    gate matters: a model VARIABLE literally named mu/nu (params or
    batch_stats) must stay replicated or the ZeRO invariant breaks."""
    shape = getattr(leaf, "shape", ())
    in_opt_state = bool(path) and _entry_name(path[0]) == "opt_state"
    in_moments = in_opt_state and any(
        _entry_name(e) in ("mu", "nu") for e in path[1:])
    if (
        n_data > 1
        and in_moments
        and len(shape) >= 1
        and shape[-1] >= min_size
        and shape[-1] % n_data == 0
    ):
        return P(*([None] * (len(shape) - 1)), DATA_AXIS)
    return P()


def zero_state_shardings(state, mesh: Mesh,
                         min_size: int = MIN_SHARDED_SIZE):
    """Pytree of NamedShardings for a TrainState: Adam moments sharded over
    'data', params/batch_stats/step/counts replicated. Feed to
    jax.device_put AND to make_train_step(state_out_shardings=...) so the
    partition survives the update."""
    n_data = int(mesh.shape.get(DATA_AXIS, 1))

    def spec(path, leaf):
        return NamedSharding(
            mesh, moment_partition_spec(path, leaf, n_data, min_size))

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state_zero(state, mesh: Mesh, min_size: int = MIN_SHARDED_SIZE):
    """Place a TrainState on the data mesh with ZeRO-1 moment sharding."""
    return jax.device_put(state, zero_state_shardings(state, mesh, min_size))
