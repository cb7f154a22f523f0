"""REAL multi-host smoke test: two OS processes run the actual tdnet
multi-host path — jax.distributed bring-up (Gloo CPU collectives), a global
2-device mesh, per-process BatchLoader shards (process_index auto-detected
from jax), make_global_batch assembly, and one full sharded train step.

This is the strongest offline validation of SURVEY.md §2.4's plan short of
real multi-host hardware: the same code the train CLI runs under
`--distributed coord:port,2,rank`.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
# one device per process: the parent's 8-device XLA_FLAGS must not leak
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
port = sys.argv[2]

sys.path.insert(0, @@REPO@@)
from tdnet.parallel.mesh import (
    batch_sharding, create_mesh, initialize_distributed, make_global_batch,
    replicated_sharding,
)

initialize_distributed("127.0.0.1:" + port, num_processes=2, process_id=rank)
assert jax.process_count() == 2 and jax.process_index() == rank

import jax.numpy as jnp
import numpy as np

from tdnet.data.generator import BatchLoader, LoaderConfig
from tdnet.models.retinanet import RetinaNet
from tdnet.train.step import create_train_state, make_train_step

from tests.data.test_generator import SyntheticDataset

# --- per-host dataset shard (process_index auto-detected from jax) ------
ds = SyntheticDataset([(100, 200)] * 8)
cfg = LoaderConfig(batch_size=2, min_side=64, max_side=128,
                   buckets=[(64, 128)], shuffle=False)
loader = BatchLoader(ds, cfg)
assert loader.process_count == 2 and loader.process_index == rank
shard = [i for _, idxs in loader.local_batches() for i in idxs]
print(f"SHARD {rank} {sorted(shard)}", flush=True)

# --- one sharded train step across the two processes --------------------
mesh = create_mesh()
assert len(mesh.devices.flat) == 2  # one device per host

model = RetinaNet(num_classes=1, dtype=jnp.float32)
state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
state = jax.device_put(state, replicated_sharding(mesh))

local_batch = next(iter(loader.epoch()))  # this host's 2 images
global_batch = make_global_batch(
    {k: v for k, v in local_batch.items() if k != "scale" and k != "indices"},
    batch_sharding(mesh),
)
assert global_batch["images"].shape[0] == 4  # 2 per host -> global 4

train_step = make_train_step(model, num_classes=1)
new_state, metrics = train_step(state, global_batch)
(new_state, metrics) = jax.block_until_ready((new_state, metrics))
loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss)
kernel = new_state.params["fpn"]["P3"]["kernel"]
assert kernel.sharding.is_fully_replicated
print(f"LOSS {rank} {loss:.6f}", flush=True)
print(f"OK {rank}", flush=True)
"""


def _free_port() -> str:
    """OS-assigned ephemeral port (bind 0, read back, release) — avoids
    cross-run collisions from a hardcoded coordinator port."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def test_two_process_distributed_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@@REPO@@", repr(repo)))

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"OK {rank}" in out

    # the two shards partition the dataset
    shards = []
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("SHARD"))
        shards.append(eval(line.split(" ", 2)[2]))
    assert sorted(shards[0] + shards[1]) == list(range(8))
    assert not set(shards[0]) & set(shards[1])

    # both ranks computed the identical global loss
    losses = []
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("LOSS"))
        losses.append(float(line.split()[2]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
