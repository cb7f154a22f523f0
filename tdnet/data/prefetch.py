"""Double-buffered host->device prefetch.

The reference overlaps input work with compute via keras multiprocessing
Sequence workers (SURVEY.md §2.4). The TPU-native equivalent: a background
thread runs the host pipeline and eagerly `jax.device_put`s batches with
their target sharding, keeping >=`buffer_size` batches in flight so the
device never waits on the host (BASELINE.json north star: host-side
double-buffered prefetch feeding HBM).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

__all__ = ["prefetch_to_device"]

_SENTINEL = object()


def prefetch_to_device(
    iterator: Iterator[dict],
    sharding=None,
    buffer_size: int = 2,
) -> Iterator[dict]:
    """Wrap a host batch iterator; yields device-resident batches.

    `sharding` is a jax.sharding.Sharding (or pytree of them) to place each
    batch with — typically batch-sharded over the 'data' mesh axis
    (parallel/mesh.py). None keeps default device placement.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    err: list = []

    def worker():
        try:
            for batch in iterator:
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        except Exception as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True, name="tdnet-prefetch")
    t.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
