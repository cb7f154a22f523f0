"""Deployable model artifacts (.tdn — the tdnet analog of the reference's
h5 models; reference: models/__init__.py load_model/convert_model).

A .tdn file is a msgpack bundle of:
  meta:      {format version, model config (backbone, num_classes, ...),
              anchor parameters, inference config (nms thresholds, ...)}
  variables: {params, batch_stats} flax state dict

Training snapshots (orbax checkpoints, train/checkpoint.py) and deployable
models are different artifacts sharing weights — exactly the reference's
training-vs-inference-graph split (SURVEY.md §4.4: "the checkpoint-format
fulcrum"). bin/convert_model.py turns one into the other.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import serialization

from tdnet.models.retinanet import RetinaNet
from tdnet.ops.anchors import AnchorParameters

__all__ = ["save_model", "load_model", "DEFAULT_INFERENCE_CONFIG"]

FORMAT_VERSION = 1

DEFAULT_INFERENCE_CONFIG = {
    "nms": True,
    "class_specific_filter": True,
    "score_threshold": 0.05,
    "max_detections": 300,
    "nms_threshold": 0.5,
    "soft_nms_sigma": 0.0,  # > 0 switches to gaussian soft-NMS (config 5)
    "min_side": 800,
    "max_side": 1333,
    "preprocess_mode": "caffe",
}


def save_model(
    path: str,
    model: RetinaNet,
    variables: Dict[str, Any],
    anchor_params: Optional[AnchorParameters] = None,
    inference_config: Optional[dict] = None,
) -> None:
    meta = {
        "format_version": FORMAT_VERSION,
        "model": {
            "num_classes": model.num_classes,
            "backbone_name": model.backbone_name,
            "num_anchors": model.num_anchors,
            "feature_size": model.feature_size,
            "prior_probability": model.prior_probability,
        },
        "anchors": dataclasses.asdict(anchor_params) if anchor_params else None,
        "inference": {**DEFAULT_INFERENCE_CONFIG, **(inference_config or {})},
    }
    payload = {
        "meta": meta,
        "variables": {
            "params": _to_numpy(variables["params"]),
            "batch_stats": _to_numpy(variables.get("batch_stats", {})),
        },
    }
    data = serialization.msgpack_serialize(payload)
    with open(path, "wb") as f:
        f.write(data)


def _to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_model(
    path: str, dtype: Any = jnp.float32
) -> Tuple[RetinaNet, Dict[str, Any], dict]:
    """Load a .tdn bundle -> (model, variables, meta)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = payload["meta"]
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported .tdn format version {meta.get('format_version')}"
        )
    mc = meta["model"]
    model = RetinaNet(
        num_classes=int(mc["num_classes"]),
        backbone_name=mc["backbone_name"],
        num_anchors=int(mc["num_anchors"]),
        feature_size=int(mc["feature_size"]),
        prior_probability=float(mc["prior_probability"]),
        dtype=dtype,
    )
    variables = {
        "params": payload["variables"]["params"],
        "batch_stats": payload["variables"]["batch_stats"],
    }
    return model, variables, meta


def anchor_params_from_meta(meta: dict) -> Optional[AnchorParameters]:
    a = meta.get("anchors")
    if not a:
        return None
    return AnchorParameters(
        sizes=tuple(a["sizes"]),
        strides=tuple(a["strides"]),
        ratios=tuple(a["ratios"]),
        scales=tuple(a["scales"]),
    )
