"""Keras-retinanet h5 -> tdnet weight importer.

The sub-pixel parity requirement (BASELINE.json:5 "on the same weights")
needs reference-trained Keras weights loaded into the tdnet pytree
(SURVEY.md §6 "Checkpoint / resume": map Keras conv HWIO + BN params onto
the JAX pytree).

Keras layer naming (keras-resnet + keras_retinanet/models/retinanet.py):
  conv1, bn_conv1                                  -> backbone conv1/bn1
  res{S}{b}_branch2a/2b/2c (+ bn...)               -> stage{S}_block{i} conv1..3
  res{S}{b}_branch1, bn{S}{b}_branch1              -> projection shortcut
  C3_reduced/C4_reduced/C5_reduced/P3..P7          -> fpn
  pyramid_classification_{0..3} / _submodel heads  -> classification_submodel
  pyramid_regression_{0..3} / heads                -> regression_submodel

Keras Conv2D kernels are HWIO — identical to flax's layout, so kernels copy
through without transpose. Keras BN stores (gamma, beta, moving_mean,
moving_variance) -> (scale, bias, mean, var).

Offline environments rarely have reference-trained h5 files; parity is then
proven the other way round: `export_random_keras_weights` writes a
Keras-layout h5 from a random init so both frameworks can be driven with
the same weights (SURVEY.md §8 "Trained weights may be unobtainable").
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["load_keras_retinanet_h5", "keras_name_map", "export_random_keras_weights"]


def _block_letter(block: int, stage_blocks: int) -> str:
    # keras-resnet: blocks lettered a, b, c, ... per stage
    return chr(ord("a") + block)


def keras_name_map(stage_sizes=(3, 4, 6, 3)) -> Dict[str, Tuple[str, ...]]:
    """Map Keras layer name -> tdnet param path (tuple of pytree keys).

    Conv layers map to (…, 'kernel'[, 'bias']); BN layers map to the
    FrozenBatchNorm param/batch_stats leaves.
    """
    m: Dict[str, Tuple[str, ...]] = {}

    m["conv1"] = ("backbone", "conv1")
    m["bn_conv1"] = ("backbone", "bn1")

    for stage, num_blocks in enumerate(stage_sizes):
        s = stage + 2  # keras-resnet naming: res2.., res3..
        for block in range(num_blocks):
            letter = _block_letter(block, num_blocks)
            base = ("backbone", f"stage{s}_block{block}")
            m[f"res{s}{letter}_branch2a"] = base + ("conv1",)
            m[f"bn{s}{letter}_branch2a"] = base + ("bn1",)
            m[f"res{s}{letter}_branch2b"] = base + ("conv2",)
            m[f"bn{s}{letter}_branch2b"] = base + ("bn2",)
            m[f"res{s}{letter}_branch2c"] = base + ("conv3",)
            m[f"bn{s}{letter}_branch2c"] = base + ("bn3",)
            if block == 0:  # projection shortcut exists only on the first block
                m[f"res{s}{letter}_branch1"] = base + ("conv_shortcut",)
                m[f"bn{s}{letter}_branch1"] = base + ("bn_shortcut",)

    for name in ["C3_reduced", "C4_reduced", "C5_reduced", "P3", "P4", "P5", "P6", "P7"]:
        m[name] = ("fpn", name)

    for i in range(4):
        m[f"pyramid_classification_{i}"] = ("classification_submodel", f"conv{i}")
        m[f"pyramid_regression_{i}"] = ("regression_submodel", f"conv{i}")
    m["pyramid_classification"] = ("classification_submodel", "head")
    m["pyramid_regression"] = ("regression_submodel", "head")
    return m


def _set_path(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _walk_h5_weights(h5group, prefix=""):
    """Yield (weight_name, np.array) for every dataset under a group."""
    import h5py

    for key in h5group:
        item = h5group[key]
        if isinstance(item, h5py.Dataset):
            yield prefix + key, np.asarray(item)
        else:
            yield from _walk_h5_weights(item, prefix + key + "/")


def load_keras_retinanet_h5(
    path: str, variables: dict, stage_sizes=(3, 4, 6, 3), strict: bool = True
) -> dict:
    """Load a keras-retinanet h5 into a copy of tdnet `variables`.

    `variables` provides the template {'params': ..., 'batch_stats': ...};
    returns a new dict with matched leaves replaced. With strict=True every
    Keras conv/BN weight must find a home.
    """
    import copy

    import h5py

    name_map = keras_name_map(stage_sizes)
    params = copy.deepcopy(
        {"params": _to_plain(variables["params"]),
         "batch_stats": _to_plain(variables.get("batch_stats", {}))}
    )

    unmatched = []
    with h5py.File(path, "r") as f:
        group = f["model_weights"] if "model_weights" in f else f
        weights = dict(_walk_h5_weights(group))

    for wname, array in weights.items():
        parts = [p for p in wname.split("/") if p]
        # h5 layout: <layer>/<layer>/<weight_name> (keras duplicates the name)
        layer = next((p for p in parts if p in name_map), None)
        leaf = parts[-1].split(":")[0]
        if layer is None:
            unmatched.append(wname)
            continue
        path_ = name_map[layer]
        if leaf == "kernel":
            _set_path(params["params"], path_ + ("kernel",), array)
        elif leaf == "bias":
            _set_path(params["params"], path_ + ("bias",), array)
        elif leaf == "gamma":
            _set_path(params["params"], path_ + ("scale",), array)
        elif leaf == "beta":
            _set_path(params["params"], path_ + ("bias",), array)
        elif leaf == "moving_mean":
            _set_path(params["batch_stats"], path_ + ("mean",), array)
        elif leaf == "moving_variance":
            _set_path(params["batch_stats"], path_ + ("var",), array)
        else:
            unmatched.append(wname)

    if strict and unmatched:
        raise ValueError(f"unmatched Keras weights: {unmatched[:10]}...")
    return params


def _to_plain(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return np.asarray(tree)


def export_random_keras_weights(
    path: str, variables: dict, stage_sizes=(3, 4, 6, 3)
) -> None:
    """Write tdnet variables to an h5 in Keras naming — the round-trip half
    of the parity harness."""
    import h5py

    name_map = keras_name_map(stage_sizes)
    params = _to_plain(variables["params"])
    stats = _to_plain(variables.get("batch_stats", {}))

    def get_path(tree, path_):
        node = tree
        for k in path_:
            if k not in node:
                return None
            node = node[k]
        return node

    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        for layer, path_ in name_map.items():
            lg = g.create_group(layer).create_group(layer)
            p = get_path(params, path_)
            if p is None:
                continue
            if "kernel" in p:  # conv layer
                lg.create_dataset("kernel:0", data=np.asarray(p["kernel"]))
                if "bias" in p:
                    lg.create_dataset("bias:0", data=np.asarray(p["bias"]))
            elif "scale" in p:  # batch norm
                lg.create_dataset("gamma:0", data=np.asarray(p["scale"]))
                lg.create_dataset("beta:0", data=np.asarray(p["bias"]))
                s = get_path(stats, path_)
                lg.create_dataset("moving_mean:0", data=np.asarray(s["mean"]))
                lg.create_dataset("moving_variance:0", data=np.asarray(s["var"]))
