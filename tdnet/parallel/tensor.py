"""Tensor (model) parallelism: shard conv output channels over a 'model' axis.

The reference has no model parallelism at all (its only parallelism is
keras multi_gpu_model data parallelism — SURVEY.md §2.4); parallel/mesh.py
documents why a ResNet-50 detector rarely NEEDS it (weights + optimizer
state fit per chip). What data parallelism cannot do, though, is reduce
the latency or per-chip weight/optimizer footprint of ONE step at a fixed
per-chip batch — the same motivation as parallel/spatial.py, attacked on
the other tensor dimension. Spatial partitioning shards the activation
plane (H); tensor parallelism shards the CHANNEL dimension of the conv
weights themselves, the TPU-native analog of Megatron-style column
parallelism for the conv trunk:

- Mesh: 2-D ('data', 'model'). Batches shard over 'data' exactly as in
  parallel/mesh.py (P('data') on this mesh replicates over 'model').
- Params: every conv kernel whose output-channel dim is divisible by the
  model axis and at least `min_channels` wide is placed
  P(None, ..., 'model') — sharded on C_out; everything else (biases, BN
  scale/offset, the 9*K/9*4 task heads, scalars) stays replicated. The
  SAME rule maps over the optimizer state: Adam's mu/nu mirror the param
  tree, so each moment shards exactly like its param — per-chip optimizer
  memory divides by the model axis along with the weights.
- Collectives: everything rides GSPMD. A C_out-sharded conv computes its
  channel slice from the full input (one all-gather of the input's
  channel shards per conv, inserted by the partitioner over ICI); the
  kernel GRADIENT of that conv is computed shard-locally and needs no
  all-reduce over 'model' (each device owns its slice) — only the 'data'
  axis all-reduces gradients, and each device then runs the Adam update
  on 1/model-th of the weights. No hand-written collectives anywhere.

Why placement alone is enough: tdnet's train step is a plain jax.jit
(train/step.py) — GSPMD propagates the explicit input shardings through
value_and_grad and the optax update, so the updated params/moments come
back with the same sharding they went in with (asserted in
tests/parallel/test_tensor.py). The Pallas ingest/stem kernels are
1-D-data-mesh-only and train/step.py's mesh guards already route a
('data', 'model') mesh to the plain-jnp normalize fallback.

Scope note: exercised on the virtual 8-device CPU mesh
(tests/parallel/test_tensor.py asserts loss/param equivalence against the
single-device step and that the sharding actually sticks) and compiled in
dryrun_multichip; real-ICI profiling needs a multi-chip slice. Train CLI:
`--tensor-parallel M`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdnet.parallel.mesh import DATA_AXIS

__all__ = [
    "MODEL_AXIS",
    "create_tensor_mesh",
    "model_size",
    "param_partition_spec",
    "state_shardings",
    "shard_state",
]

MODEL_AXIS = "model"

# Kernels narrower than this stay replicated: sharding a 36-channel task
# head saves nothing and costs a collective; the towers/FPN (256) and the
# backbone trunk (256-2048) are where the weights and FLOPs are.
MIN_SHARDED_CHANNELS = 64


def create_tensor_mesh(
    n_model: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D (data, model) mesh: `n_model` devices along the model axis, the
    rest along data. n_model must divide the device count. n_model == 1
    degenerates to plain data-parallel semantics (axis kept, sized 1)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_model < 1 or n % n_model:
        raise ValueError(f"model axis {n_model} must divide the {n} devices")
    grid = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


def model_size(mesh: Mesh) -> int:
    """Size of the model axis (1 when the mesh has none)."""
    return int(mesh.shape.get(MODEL_AXIS, 1))


def _key_name(entry) -> Optional[str]:
    """Dict key / attribute name of one tree_map_with_path entry."""
    for attr in ("key", "name"):
        v = getattr(entry, attr, None)
        if isinstance(v, str):
            return v
    return None


def param_partition_spec(
    path, leaf, n_model: int, min_channels: int = MIN_SHARDED_CHANNELS
) -> P:
    """PartitionSpec for one state leaf under C_out sharding.

    Applies to any leaf whose FINAL tree key is 'kernel' (flax conv/dense
    params — and therefore also Adam's mu/nu, which mirror the param tree
    key-for-key) with >= 2 dims and a wide-enough, divisible last dim."""
    shape = getattr(leaf, "shape", ())
    if (
        n_model > 1
        and path
        and _key_name(path[-1]) == "kernel"
        and len(shape) >= 2
        and shape[-1] >= min_channels
        and shape[-1] % n_model == 0
    ):
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    return P()


def state_shardings(
    state, mesh: Mesh, min_channels: int = MIN_SHARDED_CHANNELS
):
    """Pytree of NamedShardings matching `state` (a TrainState, a variables
    dict, or any pytree): conv kernels C_out-sharded over 'model', all
    other leaves replicated. Feed to jax.device_put / make_global_batch."""
    n_model = model_size(mesh)

    def spec(path, leaf):
        return NamedSharding(
            mesh, param_partition_spec(path, leaf, n_model, min_channels)
        )

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state(state, mesh: Mesh, min_channels: int = MIN_SHARDED_CHANNELS):
    """Place a TrainState on the (data, model) mesh with kernels (and their
    Adam moments) sharded over 'model'."""
    return jax.device_put(state, state_shardings(state, mesh, min_channels))
