"""Double-buffered host->device prefetch.

The reference overlaps input work with compute via keras multiprocessing
Sequence workers (SURVEY.md §2.4). The TPU-native equivalent: a background
thread runs the host pipeline and eagerly `jax.device_put`s batches with
their target sharding, keeping >=`buffer_size` batches in flight so the
device never waits on the host (BASELINE.json north star: host-side
double-buffered prefetch feeding HBM).

The returned iterator owns its worker thread: `.close()` (also wired to GC
and generator close) signals the worker to stop, so abandoning the iterator
mid-stream (e.g. a fixed-steps training loop over an infinite source) does
not leak a thread parked on a full queue holding device buffers alive.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

__all__ = ["prefetch_to_device", "DevicePrefetcher"]

_SENTINEL = object()


def _pack_uint8_images(batch):
    """Pack NHWC uint8 canvases to (B, H, W*3) byte rows before crossing
    the jit boundary (the uint8 boundary convention —
    ops/pallas_ingest.pack_uint8_host has the layout-trap numbers)."""
    import numpy as np

    if (
        isinstance(batch, dict)
        and isinstance(batch.get("images"), np.ndarray)
        and batch["images"].dtype == np.uint8
        and batch["images"].ndim == 4
        and batch["images"].shape[-1] == 3
    ):
        from tdnet.ops.pallas_ingest import pack_uint8_host

        batch = dict(batch)
        batch["images"] = pack_uint8_host(batch["images"])
    return batch


class DevicePrefetcher:
    """Iterator wrapper; see module docstring."""

    def __init__(self, iterator, sharding=None, buffer_size: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._err: list = []

        def worker():
            try:
                for batch in iterator:
                    if self._stop.is_set():
                        return
                    batch = _pack_uint8_images(batch)
                    if sharding is not None:
                        # multi-host aware: local shard -> global array.
                        # A callable sharding is a factory evaluated on
                        # each batch (e.g. parallel/spatial.batch_shardings
                        # keyed on the batch's own keys).
                        from tdnet.parallel.mesh import make_global_batch

                        s = sharding(batch) if callable(sharding) else sharding
                        batch = make_global_batch(batch, s)
                    else:
                        batch = jax.device_put(batch)
                    # bounded put that notices close()
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except Exception as e:  # propagate into the consumer
                self._err.append(e)
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(
            target=worker, daemon=True, name="tdnet-prefetch"
        )
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        # bounded get that re-checks _stop: if close() lands while we are
        # blocked (the worker's finally may skip the sentinel once stopped),
        # we wake up instead of hanging forever on an empty queue
        while True:
            if self._stop.is_set():
                raise StopIteration
            try:
                item = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                continue
        if item is _SENTINEL:
            if self._err:
                raise self._err[0]
            raise StopIteration
        return item

    def close(self) -> None:
        """Stop the worker and drop buffered batches."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)

    def __del__(self):  # best-effort cleanup on GC
        try:
            self._stop.set()
        except Exception:
            pass


def prefetch_to_device(
    iterator,
    sharding=None,
    buffer_size: int = 2,
) -> "DevicePrefetcher":
    """Wrap a host batch iterator; yields device-resident batches.

    `sharding` is a jax.sharding.Sharding (or pytree of them) to place each
    batch with — typically batch-sharded over the 'data' mesh axis
    (parallel/mesh.py). None keeps default device placement.
    """
    return DevicePrefetcher(iterator, sharding=sharding, buffer_size=buffer_size)
