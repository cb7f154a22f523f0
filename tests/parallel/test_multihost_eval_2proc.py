"""REAL 2-process sharded evaluation: each rank predicts a strided slice of
the val set, detections are all-gathered (parallel/mesh.py
process_allgather_rows), and BOTH the VOC evaluator and the COCO summary
must be BIT-IDENTICAL to a single-process run on every rank.

Uses an UNEVEN dataset size (5 images over 2 ranks -> 3/2 shards) and a
deterministic scripted predictor, so the test exercises the ragged gather
without model compute. Companion to test_multihost_2proc.py (train step)
and test_multihost_epoch_2proc.py (epoch boundary).
"""

import os
import subprocess
import sys


WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
port = sys.argv[2]

sys.path.insert(0, @@REPO@@)
from tdnet.parallel.mesh import initialize_distributed, process_allgather_rows

initialize_distributed("127.0.0.1:" + port, num_processes=2, process_id=rank)
assert jax.process_count() == 2 and jax.process_index() == rank

import numpy as np

# --- ragged all-gather primitive ----------------------------------------
local = np.arange((rank + 1) * 3, dtype=np.float64).reshape(-1, 1) + 10 * rank
gathered = process_allgather_rows(local)
expect = np.concatenate(
    [np.arange(3, dtype=np.float64).reshape(-1, 1),
     np.arange(6, dtype=np.float64).reshape(-1, 1) + 10])
assert np.array_equal(gathered, expect), (gathered, expect)
print(f"GATHER {rank} ok", flush=True)

# --- sharded VOC + COCO eval == single-process eval, bit-exact ----------
from tdnet.utils.eval import evaluate
from tdnet.utils.coco_eval import evaluate_coco


class FiveImages:
    # 5 images (uneven 3/2 shards), 2 classes, deterministic GT
    def __init__(self):
        rng = np.random.RandomState(0)
        self.gt = {}
        for i in range(5):
            n = 1 + i % 3
            xy = rng.uniform(0, 120, (n, 2))
            wh = rng.uniform(20, 60, (n, 2))
            self.gt[i] = np.concatenate([xy, xy + wh], axis=1)

    def size(self):
        return 5

    def num_classes(self):
        return 2

    def has_label(self, label):
        return True

    def label_to_name(self, label):
        return f"c{label}"

    def load_image(self, i):
        return np.zeros((200, 200, 3), np.float32) + i

    def load_annotations(self, i):
        return {"bboxes": self.gt[i],
                "labels": np.arange(len(self.gt[i])) % 2}


ds = FiveImages()
_pred_rng = np.random.RandomState(7)
_noise = {i: _pred_rng.uniform(-6, 6, ds.gt[i].shape) for i in range(5)}


def predictor(image):
    i = int(image[0, 0, 0])
    boxes = ds.gt[i] + _noise[i]
    scores = 0.9 - 0.07 * np.arange(len(boxes))
    labels = np.arange(len(boxes)) % 2
    return boxes, scores, labels


aps_single = evaluate(ds, predictor)             # full set, this process
aps_sharded = evaluate(ds, predictor, shard=True)
assert set(aps_single) == set(aps_sharded)
for k in aps_single:
    assert aps_single[k][1] == aps_sharded[k][1], k
    assert aps_single[k][0] == aps_sharded[k][0], (
        k, aps_single[k], aps_sharded[k])  # bit-exact, not approx
print(f"VOC {rank} {aps_sharded[0][0]:.12f} {aps_sharded[1][0]:.12f}",
      flush=True)

coco_single = evaluate_coco(ds, predictor)
coco_sharded = evaluate_coco(ds, predictor, shard=True)
for k in coco_single:
    assert coco_single[k] == coco_sharded[k], (k, coco_single[k],
                                               coco_sharded[k])
print(f"COCO {rank} {coco_sharded['AP']:.12f}", flush=True)
print(f"OK {rank}", flush=True)
"""


def _free_port() -> str:
    """OS-assigned ephemeral port (bind 0, read back, release) — avoids
    cross-run collisions from a hardcoded coordinator port."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def test_two_process_sharded_eval(tmp_path):
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

    # both ranks computed the identical metrics
    for tag in ("VOC", "COCO"):
        lines = [next(l for l in out.splitlines() if l.startswith(tag))
                 for out in outs]
        assert lines[0].split()[2:] == lines[1].split()[2:], lines
