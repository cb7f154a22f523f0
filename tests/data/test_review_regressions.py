"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

from tdnet.data.generator import BatchLoader, LoaderConfig
from tdnet.data.image import preprocess_image_device
from tdnet.ops.soft_nms import soft_nms_rescore


class PaddedPage:
    """Image whose resize leaves real padding in the bucket."""

    def size(self):
        return 1

    def num_classes(self):
        return 1

    def image_aspect_ratio(self, i):
        return 150 / 100

    def load_image(self, i):
        return np.full((100, 150, 3), 200.0, dtype=np.float32)

    def load_annotations(self, i):
        return {"labels": np.zeros(1, np.int64),
                "bboxes": np.array([[10.0, 10.0, 50.0, 50.0]])}


def test_device_normalize_padding_matches_host():
    # bucket (64, 128): resized 64x96 leaves a 32px pad strip on the right
    kw = dict(batch_size=1, min_side=64, max_side=128, buckets=[(64, 128)],
              shuffle=False)
    host = next(iter(BatchLoader(PaddedPage(), LoaderConfig(**kw))))
    dev = next(iter(BatchLoader(PaddedPage(), LoaderConfig(device_normalize=True, **kw))))

    normalized = np.asarray(preprocess_image_device(dev["images"], "caffe"))
    # padding region must agree too (host pads 0 == mean pixel)
    assert np.abs(normalized - host["images"]).max() <= 1.0
    pad_region = normalized[0, :, 100:, :]
    assert np.abs(pad_region).max() <= 1.0


def test_soft_nms_linear_identical_boxes_no_nan_poison():
    # duplicate box with IoU=1 decays to exactly 0 under linear soft-NMS;
    # the far third box must still be selected (was NaN-poisoned)
    boxes = np.array(
        [[0, 0, 10, 10], [0, 0, 10, 10], [100, 100, 110, 110]], np.float32
    )
    scores = np.array([0.9, 0.0005, 0.7], np.float32)
    out = np.asarray(
        soft_nms_rescore(boxes, scores, method="linear", iou_threshold=0.3)
    )
    assert not np.isnan(out).any()
    assert out[0] == pytest.approx(0.9)
    assert out[2] == pytest.approx(0.7)


def test_steps_per_epoch_matches_epoch_yield_count():
    class TwoBuckets:
        def size(self):
            return 10

        def num_classes(self):
            return 1

        def image_aspect_ratio(self, i):
            return 2.0 if i < 5 else 0.5

        def load_image(self, i):
            h, w = (100, 200) if i < 5 else (200, 100)
            return np.zeros((h, w, 3), np.float32)

        def load_annotations(self, i):
            return {"labels": np.zeros(0, np.int64), "bboxes": np.zeros((0, 4))}

    loader = BatchLoader(
        TwoBuckets(),
        LoaderConfig(batch_size=4, min_side=64, max_side=128,
                     buckets=[(64, 128), (128, 64)], shuffle=False),
    )
    yielded = len(list(loader.epoch()))
    assert loader.steps_per_epoch() == yielded == 4  # ceil(5/4) per bucket


def test_anchor_config_changes_model_head_width(tmp_path):
    """num_anchors from --config must reach the model heads (train CLI)."""
    import jax

    from tdnet.bin.train import parse_args
    from tdnet.bin._common import anchor_params_from_args
    from tdnet.models import backbone as backbone_registry
    from tdnet.ops.anchors import AnchorParameters

    ini = tmp_path / "anchors.ini"
    ini.write_text("[anchor_parameters]\nratios = 0.5 1 2\nscales = 1 1.5\n")
    args = parse_args(["--config", str(ini), "csv", "a.csv", "c.csv"])
    anchor_params = anchor_params_from_args(args)
    assert anchor_params.num_anchors == 6

    model = backbone_registry("resnet50").retinanet(
        1, num_anchors=anchor_params.num_anchors
    )
    import jax.numpy as jnp

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    from tdnet.ops.anchors import anchors_for_shape

    n = anchors_for_shape((64, 64), anchor_params=anchor_params).shape[0]
    assert out["regression"].shape == (1, n, 4)
