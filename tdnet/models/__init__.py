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


# ResNet family uses caffe-mode preprocessing (BGR + mean subtraction),
# reference: models/resnet.py ResNetBackbone.preprocess_image.
_REGISTRY = {
    "resnet50": Backbone("resnet50", "caffe"),
    "resnet101": Backbone("resnet101", "caffe"),
    "resnet152": Backbone("resnet152", "caffe"),
}


def backbone(name: str) -> Backbone:
    """Look up a backbone by name (reference: models/__init__.py backbone())."""
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown backbone {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]
