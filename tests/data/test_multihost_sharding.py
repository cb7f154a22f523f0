"""Per-host input sharding (SURVEY.md §2.4): all processes must agree on the
global batch sequence — same buckets, same step count at every global step —
with each process loading a disjoint slice of every global batch; and the
thread-pool loader must produce byte-identical batches to the synchronous
path."""

import numpy as np

from tdnet.data.generator import BatchLoader, LoaderConfig

from tests.data.test_generator import SyntheticDataset


def _shard_loader(ds, rank, nproc, **kw):
    cfg = LoaderConfig(
        batch_size=2, min_side=64, max_side=128, buckets=[(64, 128), (128, 64)],
        process_index=rank, process_count=nproc, **kw,
    )
    return BatchLoader(ds, cfg)


def test_two_shards_agree_on_buckets_and_cover_epoch():
    # 7 landscape + 4 portrait with global batch 4: bucket A has a padded
    # final chunk (7 -> 4+4), bucket B divides evenly — the exact uneven
    # case that desynchronized the old per-host grouping.
    ds = SyntheticDataset([(100, 200)] * 7 + [(200, 100)] * 4)
    l0 = _shard_loader(ds, 0, 2, seed=5)
    l1 = _shard_loader(ds, 1, 2, seed=5)
    for _ in range(3):  # stays true epoch after epoch (same RNG stream)
        b0, b1 = l0.local_batches(), l1.local_batches()
        # identical step count and identical bucket at every step
        assert [b for b, _ in b0] == [b for b, _ in b1]
        assert len(b0) == l0.steps_per_epoch() == l1.steps_per_epoch() == 3
        # each global batch: disjoint local slices of the same global chunk
        seen = []
        for (_, c0), (_, c1) in zip(b0, b1):
            assert len(c0) == len(c1) == 2  # batch_size each
            seen.extend(c0 + c1)
        # every image appears at least once; only padding repeats (7 -> 8)
        assert set(seen) == set(range(ds.size()))
        assert len(seen) == 12  # 3 global batches x 4


def test_single_process_default_is_whole_dataset():
    ds = SyntheticDataset([(100, 200)] * 5)
    loader = _shard_loader(ds, 0, 1, shuffle=False)
    seen = [i for _, chunk in loader.local_batches() for i in chunk]
    assert sorted(set(seen)) == list(range(5))


def test_steps_per_epoch_identical_across_ranks_uneven():
    # 9 images over 2 hosts: the old per-host count gave rank0 3 steps and
    # rank1 2 (deadlock); the global count is ceil(9/4) = 3 on both.
    ds = SyntheticDataset([(100, 200)] * 9)
    r0 = _shard_loader(ds, 0, 2, shuffle=False)
    r1 = _shard_loader(ds, 1, 2, shuffle=False)
    assert r0.steps_per_epoch() == r1.steps_per_epoch() == 3
    assert len(r0.local_batches()) == len(r1.local_batches()) == 3
    full = _shard_loader(ds, 0, 1, shuffle=False)
    assert full.steps_per_epoch() == 5  # ceil(9/2) single-host


def test_worker_pool_batches_identical():
    ds = SyntheticDataset([(100, 200)] * 6 + [(200, 100)] * 2)
    kw = dict(batch_size=2, min_side=64, max_side=128,
              buckets=[(64, 128), (128, 64)], shuffle=False,
              random_transform=True, seed=11)
    sync_batches = list(BatchLoader(ds, LoaderConfig(workers=0, **kw)).epoch())
    pool_loader = BatchLoader(ds, LoaderConfig(workers=4, **kw))
    pool_batches = list(pool_loader.epoch())
    pool_loader.close()

    assert len(sync_batches) == len(pool_batches)
    for a, b in zip(sync_batches, pool_batches):
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])
