"""Leak-budget-proof long training: supervise tdnet-train across restarts.

The axon-tunnel transport leaks ~the transfer size in host RSS on every
host->device transfer (PERF.md "Host-side transfer leak"; the round-4
150-epoch generalization run was OOM-killed at epoch 81). The round-4
answer was "size your run to the leak"; this wrapper makes long runs
leak-budget-PROOF instead (round-4 verdict item 3):

    python tools/train_restarts.py --rss-budget-mb 60000 \
        --snapshot-path /tmp/run/snaps -- \
        --batch-size 8 --epochs 150 ... csv ann.csv classes.csv

Everything after `--` is passed to `python -m tdnet.bin.train` verbatim.
The wrapper adds `--rss-budget-mb` + `--snapshot-path`; the train CLI
checkpoints every epoch and exits with code 75 (sysexits EX_TEMPFAIL)
when host RSS crosses the budget. The wrapper then RELAUNCHES a fresh
process with `--snapshot <snapshot-path>` — the fresh process starts with
a clean heap (the leak is per-process native memory, so exit IS the
reclaim), orbax restores {params, opt_state, step}, and the loader
replays its RNG streams to the resume epoch
(data/generator.py skip_epochs), so the stitched trajectory equals an
unbroken run's (tests/train/test_resume_fidelity_slow.py proves
per-epoch-loss equality). Any exit code other than 0/75 is a real
failure and is returned as-is.

Reference analog: crash = rerun with --snapshot (SURVEY.md §6 "Failure
detection"); this automates the rerun and makes the "crash" a planned,
checkpoint-coherent exit.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" not in argv:
        print("usage: train_restarts.py [wrapper flags] -- <train args>",
              file=sys.stderr)
        return 2
    split = argv.index("--")
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--rss-budget-mb", type=float, required=True,
                   help="host-RSS budget per process part (the train CLI "
                        "exits 75 past it, after checkpointing)")
    p.add_argument("--snapshot-path", required=True,
                   help="checkpoint directory shared by all parts")
    p.add_argument("--max-restarts", type=int, default=100,
                   help="give up after this many relaunches (a run that "
                        "can't finish an epoch inside the budget would "
                        "otherwise loop forever)")
    p.add_argument("--python", default=sys.executable)
    wrapper = p.parse_args(argv[:split])
    train_args = argv[split + 1:]

    for banned in ("--snapshot", "--snapshot-path", "--no-snapshots",
                   "--rss-budget-mb"):
        if banned in train_args:
            print(f"train_restarts.py owns {banned}; pass it as a wrapper "
                  "flag instead", file=sys.stderr)
            return 2

    def has_snapshot() -> bool:
        d = wrapper.snapshot_path
        try:
            return any(name.isdigit() for name in os.listdir(d))
        except OSError:
            return False

    part = 0
    while True:
        cmd = [wrapper.python, "-m", "tdnet.bin.train",
               "--snapshot-path", wrapper.snapshot_path,
               "--rss-budget-mb", str(wrapper.rss_budget_mb)]
        if has_snapshot():  # also covers crash recovery on first launch
            cmd += ["--snapshot", wrapper.snapshot_path]
        cmd += train_args
        print(f"train_restarts: part {part}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd)
        if rc != 75:
            print(f"train_restarts: part {part} exited {rc} "
                  f"({'done' if rc == 0 else 'FAILED'})", flush=True)
            return rc
        part += 1
        if part > wrapper.max_restarts:
            print(f"train_restarts: exceeded --max-restarts "
                  f"{wrapper.max_restarts}; giving up", file=sys.stderr)
            return 1
        print(f"train_restarts: RSS budget hit — relaunching "
              f"(part {part}) from {wrapper.snapshot_path}", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
