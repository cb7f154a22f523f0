"""REAL multi-host epoch test: two OS processes run the ACTUAL train CLI
(tdnet.bin.train.main) over jax.distributed (Gloo CPU collectives) through
full epoch boundaries — `--steps 0` resolution, per-epoch rank-0 evaluation,
orbax checkpoint save, resume-from-snapshot, and plateau-LR bookkeeping —
on a dataset that divides UNEVENLY across hosts (9 images / 2 hosts).

Under the pre-round-3 per-host grouping, 9 images gave rank 0 five steps
and rank 1 four: the rank with the extra step blocked forever in the
collective. The global-batch-sequence loader (data/generator.py
_global_batches) makes the counts equal by construction; this test locks
the whole epoch machinery end-to-end, not just one step
(VERDICT round 2, "Multi-host hardening").
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
port = sys.argv[2]
work = sys.argv[3]

sys.path.insert(0, @@REPO@@)
from tdnet.parallel.mesh import initialize_distributed

initialize_distributed("127.0.0.1:" + port, num_processes=2, process_id=rank)
assert jax.process_count() == 2 and jax.process_index() == rank

from tdnet.bin.train import main

common = [
    "--batch-size", "1", "--steps", "0", "--lr", "1e-3",
    "--image-min-side", "64", "--image-max-side", "128",
    "--snapshot-path", os.path.join(work, "snaps"),
    "--metrics-path", os.path.join(work, f"metrics_r{rank}.jsonl"),
    "--log-every", "1", "--evaluation", "--eval-batch-size", "1",
    "csv", os.path.join(work, "ann.csv"), os.path.join(work, "classes.csv"),
    "--val-annotations", os.path.join(work, "ann.csv"),
]

# fresh run: one full epoch (5 global steps), eval on rank 0, snapshot
rc = main(["--epochs", "1"] + common)
assert rc == 0, rc
print(f"PHASE1_OK {rank}", flush=True)

# resume run (same process: compiled executables are reused): restores the
# step-5 snapshot, continues for exactly one more epoch
rc = main(["--epochs", "2", "--snapshot", os.path.join(work, "snaps")] + common)
assert rc == 0, rc
print(f"PHASE2_OK {rank}", flush=True)
"""


def _write_dataset(work):
    import cv2

    rng = np.random.RandomState(7)
    rows = []
    for i in range(9):
        img = np.full((60, 100, 3), 255, np.uint8)
        if i == 4:  # one negative example (reference CSV contract)
            rows.append(f"{work}/img{i}.png,,,,,")
        else:
            x1, y1 = rng.randint(5, 20), rng.randint(5, 15)
            x2, y2 = rng.randint(60, 95), rng.randint(40, 55)
            cv2.rectangle(img, (x1, y1), (x2, y2), (30, 30, 30), 2)
            rows.append(f"{work}/img{i}.png,{x1},{y1},{x2},{y2},table")
        cv2.imwrite(f"{work}/img{i}.png", img)
    with open(f"{work}/ann.csv", "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(f"{work}/classes.csv", "w") as f:
        f.write("table,0\n")


def _free_port() -> str:
    """OS-assigned ephemeral port (bind 0, read back, release) — avoids
    cross-run collisions from a hardcoded coordinator port."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def test_two_process_full_epoch_uneven_dataset(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    work = str(tmp_path)
    _write_dataset(work)
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@@REPO@@", repr(repo)))

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), port, work],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"PHASE1_OK {rank}" in out and f"PHASE2_OK {rank}" in out

    # identical --steps resolution on BOTH ranks: ceil(9 / (1*2)) = 5
    for out in outs:
        assert out.count("--steps 0: using one dataset pass = 5 steps/epoch") == 2

    # per-epoch eval is sharded across ranks (identical metrics everywhere);
    # the resume restored the epoch-1 snapshot
    assert "per-epoch evaluation: sharded over 2 processes" in outs[0]
    assert "mAP" in outs[0] and "mAP" in outs[1]
    for out in outs:
        assert "resumed from step 5 (epoch 1)" in out

    # snapshots for both epoch boundaries exist (shared orbax dir)
    snaps = sorted(int(d) for d in os.listdir(os.path.join(work, "snaps"))
                   if d.isdigit())
    assert snaps == [5, 10]

    # every global step's loss and lr agree across ranks (global scalars
    # under GSPMD -> plateau-LR state can never diverge)
    recs = []
    for rank in range(2):
        with open(os.path.join(work, f"metrics_r{rank}.jsonl")) as f:
            recs.append([json.loads(l) for l in f if "step" in json.loads(l)])
    assert len(recs[0]) == len(recs[1]) == 10  # 5 steps x 2 epochs
    for a, b in zip(recs[0], recs[1]):
        assert a["step"] == b["step"]
        assert a["loss"] == pytest.approx(b["loss"], rel=1e-6)
        assert a["lr"] == pytest.approx(b["lr"], rel=1e-9)
