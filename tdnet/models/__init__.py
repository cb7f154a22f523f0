"""Model registry (reference: models/__init__.py backbone()/Backbone ABC).

`backbone(name)` returns a lightweight descriptor exposing the pieces the
CLIs need: a RetinaNet constructor, the preprocessing mode, and weight
validation — the tdnet analog of the reference's Backbone ABC.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from tdnet.models.detect import decode_boxes, detections_from_outputs
from tdnet.models.resnet import STAGE_SIZES, ResNet
from tdnet.models.retinanet import RetinaNet

__all__ = [
    "Backbone",
    "backbone",
    "RetinaNet",
    "ResNet",
    "detections_from_outputs",
    "decode_boxes",
]


@dataclass(frozen=True)
class Backbone:
    """Descriptor for a registered backbone family."""

    name: str
    preprocess_mode: str  # data/image.py preprocess_image mode

    def retinanet(self, num_classes: int, dtype: Any = jnp.float32, **kwargs) -> RetinaNet:
        return RetinaNet(
            num_classes=num_classes, backbone_name=self.name, dtype=dtype, **kwargs
        )

    def validate(self) -> None:
        if self.name not in _REGISTRY:
            raise ValueError(
                f"backbone {self.name!r} not implemented; available: {sorted(_REGISTRY)}"
            )


# Preprocessing modes follow the reference backbones: ResNet/SE-ResNet/VGG
# use caffe (BGR + mean subtraction, models/resnet.py models/vgg.py
# models/senet.py); MobileNet/DenseNet use tf ([-1, 1] scaling,
# models/mobilenet.py models/densenet.py).
_REGISTRY = {
    "resnet50": Backbone("resnet50", "caffe"),
    "resnet101": Backbone("resnet101", "caffe"),
    "resnet152": Backbone("resnet152", "caffe"),
    "seresnet50": Backbone("seresnet50", "caffe"),
    "seresnet101": Backbone("seresnet101", "caffe"),
    "seresnet152": Backbone("seresnet152", "caffe"),
    "vgg16": Backbone("vgg16", "caffe"),
    "vgg19": Backbone("vgg19", "caffe"),
    "densenet121": Backbone("densenet121", "tf"),
    "densenet169": Backbone("densenet169", "tf"),
    "densenet201": Backbone("densenet201", "tf"),
    "mobilenet": Backbone("mobilenet", "tf"),
    "mobilenet_0.75": Backbone("mobilenet_0.75", "tf"),
    "mobilenet_0.5": Backbone("mobilenet_0.5", "tf"),
}


def backbone(name: str) -> Backbone:
    """Look up a backbone by name (reference: models/__init__.py backbone())."""
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown backbone {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def load_model(path: str, **kwargs):
    """API-parity alias (reference: models.load_model) -> see models/io.py."""
    from tdnet.models.io import load_model as _load

    return _load(path, **kwargs)


def convert_model(model, variables, anchor_params=None, nms=True,
                  class_specific_filter=True, **inference_overrides):
    """API-parity analog of the reference's models.convert_model: returns a
    Predictor wired with the inference tail (decode+clip+NMS), the runtime
    form of the reference's retinanet_bbox-converted graph."""
    from tdnet.train.predictor import Predictor

    return Predictor(
        model, variables, anchor_params=anchor_params, nms=nms,
        class_specific_filter=class_specific_filter, **inference_overrides,
    )
