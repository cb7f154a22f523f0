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

__all__ = [
    "load_keras_retinanet_h5",
    "keras_name_map",
    "keras_name_map_for",
    "export_random_keras_weights",
]


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

    _add_fpn_and_heads(m)
    return m


def _add_fpn_and_heads(m: Dict[str, Tuple[str, ...]]) -> None:
    """FPN + shared-subnet layer names (models/retinanet.py) — common to
    every backbone family."""
    for name in ["C3_reduced", "C4_reduced", "C5_reduced", "P3", "P4", "P5", "P6", "P7"]:
        m[name] = ("fpn", name)
    for i in range(4):
        m[f"pyramid_classification_{i}"] = ("classification_submodel", f"conv{i}")
        m[f"pyramid_regression_{i}"] = ("regression_submodel", f"conv{i}")
    m["pyramid_classification"] = ("classification_submodel", "head")
    m["pyramid_regression"] = ("regression_submodel", "head")


def keras_name_map_vgg(stage_sizes=(2, 2, 3, 3, 3)) -> Dict[str, Tuple[str, ...]]:
    """keras-applications VGG naming (block{B}_conv{i}) -> tdnet
    (models/vgg.py uses the same names under 'backbone')."""
    m: Dict[str, Tuple[str, ...]] = {}
    for block, n_convs in enumerate(stage_sizes):
        for i in range(n_convs):
            name = f"block{block + 1}_conv{i + 1}"
            m[name] = ("backbone", name)
    _add_fpn_and_heads(m)
    return m


def keras_name_map_mobilenet(num_blocks: int = 13) -> Dict[str, Tuple[str, ...]]:
    """keras-applications MobileNetV1 naming -> tdnet models/mobilenet.py."""
    m: Dict[str, Tuple[str, ...]] = {
        "conv1": ("backbone", "conv1"),
        "conv1_bn": ("backbone", "bn_conv1"),
    }
    for i in range(1, num_blocks + 1):
        m[f"conv_dw_{i}"] = ("backbone", f"conv_dw_{i}")
        m[f"conv_dw_{i}_bn"] = ("backbone", f"bn_dw_{i}")
        m[f"conv_pw_{i}"] = ("backbone", f"conv_pw_{i}")
        m[f"conv_pw_{i}_bn"] = ("backbone", f"bn_pw_{i}")
    _add_fpn_and_heads(m)
    return m


def keras_name_map_densenet(block_sizes=(6, 12, 24, 16)) -> Dict[str, Tuple[str, ...]]:
    """keras-applications DenseNet naming -> tdnet models/densenet.py.

    Both the keras-applications-1.0-era slashed names ('conv1/conv') and the
    modern underscored ones ('conv1_conv') are accepted."""
    m: Dict[str, Tuple[str, ...]] = {}
    for stem_conv in ("conv1/conv", "conv1_conv"):
        m[stem_conv] = ("backbone", "conv1")
    for stem_bn in ("conv1/bn", "conv1_bn"):
        m[stem_bn] = ("backbone", "bn1")
    for b, n_layers in enumerate(block_sizes):
        s = b + 2  # keras: conv2..conv5; tdnet: block2..block5
        for i in range(n_layers):
            base = ("backbone", f"block{s}_layer{i}")
            m[f"conv{s}_block{i + 1}_0_bn"] = base + ("bn1",)
            m[f"conv{s}_block{i + 1}_1_conv"] = base + ("conv1",)
            m[f"conv{s}_block{i + 1}_1_bn"] = base + ("bn2",)
            m[f"conv{s}_block{i + 1}_2_conv"] = base + ("conv2",)
        if b != len(block_sizes) - 1:
            m[f"pool{s}_bn"] = ("backbone", f"transition{s}_bn")
            m[f"pool{s}_conv"] = ("backbone", f"transition{s}_conv")
    _add_fpn_and_heads(m)
    return m


def keras_name_map_for(backbone_name: str) -> Dict[str, Tuple[str, ...]]:
    """Dispatch the right Keras->tdnet name map for a backbone family
    (reference: models/__init__.py load_model works for every backbone)."""
    from tdnet.models.resnet import STAGE_SIZES

    name = backbone_name
    if name.startswith("seresnet"):
        # The SE Dense params (se_reduce/se_expand) have no verified upstream
        # h5 naming available offline; silently reusing the plain ResNet map
        # would leave them at random init on a strict=False load — a
        # corrupted model with no warning. Refuse instead; callers with a
        # known layout pass name_map= explicitly.
        raise ValueError(
            f"no verified Keras h5 name map for SE-ResNet backbone "
            f"{backbone_name!r} (the se_reduce/se_expand Dense layers); pass "
            "an explicit name_map to load_keras_retinanet_h5, or import into "
            "the plain resnet and re-train the SE gates"
        )
    if name in STAGE_SIZES:
        return keras_name_map(STAGE_SIZES[name])
    if name.startswith("vgg"):
        from tdnet.models.vgg import VGG_STAGES

        return keras_name_map_vgg(VGG_STAGES[name])
    if name.startswith("densenet"):
        from tdnet.models.densenet import DENSENET_BLOCKS

        return keras_name_map_densenet(DENSENET_BLOCKS[name])
    if name.startswith("mobilenet"):
        return keras_name_map_mobilenet()
    raise ValueError(f"no Keras name map for backbone {backbone_name!r}")


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
    path: str, variables: dict, stage_sizes=(3, 4, 6, 3), strict: bool = True,
    verbose: bool = False, backbone_name: str = None, name_map: dict = None,
) -> dict:
    """Load a keras-retinanet h5 into a copy of tdnet `variables`.

    `variables` provides the template {'params': ..., 'batch_stats': ...};
    returns a new dict with matched leaves replaced. With strict=True every
    Keras conv/BN weight must find a home AND match the template's shape.
    With strict=False, unmatched or shape-mismatched weights are skipped —
    Keras `load_weights(by_name=True, skip_mismatch=True)` semantics
    (reference: bin/train.py create_models), which is what loading an
    ImageNet backbone-only h5 into a full detection model relies on.
    """
    import copy

    import h5py

    if name_map is None:
        name_map = (
            keras_name_map_for(backbone_name)
            if backbone_name
            else keras_name_map(stage_sizes)
        )
    params = copy.deepcopy(
        {"params": _to_plain(variables["params"]),
         "batch_stats": _to_plain(variables.get("batch_stats", {}))}
    )

    def _get_path(tree, path_):
        node = tree
        for k in path_:
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return node

    unmatched = []
    skipped = []
    matched = 0
    with h5py.File(path, "r") as f:
        group = f["model_weights"] if "model_weights" in f else f
        weights = dict(_walk_h5_weights(group))

    for wname, array in weights.items():
        parts = [p for p in wname.split("/") if p]
        # h5 layout: <layer>/<layer>/<weight_name> (keras duplicates the
        # name); layer names may themselves contain '/' (densenet
        # 'conv1/conv'), so prefer the longest joined match
        layer = None
        for i in range(len(parts)):
            if i + 1 < len(parts) and parts[i] + "/" + parts[i + 1] in name_map:
                layer = parts[i] + "/" + parts[i + 1]
                break
            if parts[i] in name_map and layer is None:
                layer = parts[i]
        leaf = parts[-1].split(":")[0]
        if layer is None:
            unmatched.append(wname)
            continue
        path_ = name_map[layer]
        if leaf == "depthwise_kernel":
            # keras depthwise (H, W, C, mult=1) -> flax grouped-conv
            # kernel (H, W, 1, C) (models/mobilenet.py conv_dw_*)
            array = np.transpose(array, (0, 1, 3, 2))
            leaf = "kernel"
        dest = {
            "kernel": ("params", path_ + ("kernel",)),
            "bias": ("params", path_ + ("bias",)),
            "gamma": ("params", path_ + ("scale",)),
            "beta": ("params", path_ + ("bias",)),
            "moving_mean": ("batch_stats", path_ + ("mean",)),
            "moving_variance": ("batch_stats", path_ + ("var",)),
        }.get(leaf)
        if dest is None:
            unmatched.append(wname)
            continue
        tree_key, full_path = dest
        existing = _get_path(params[tree_key], full_path)
        if existing is not None and np.shape(existing) != np.shape(array):
            skipped.append(f"{wname}: {np.shape(array)} != {np.shape(existing)}")
            continue
        _set_path(params[tree_key], full_path, array)
        matched += 1

    if strict and (unmatched or skipped):
        raise ValueError(
            f"unmatched Keras weights: {unmatched[:10]}; shape-skipped: {skipped[:10]}"
        )
    if verbose:
        msg = f"keras h5 import: matched {matched} weights from {path}"
        if unmatched:
            msg += f"; {len(unmatched)} unmatched (e.g. {unmatched[:3]})"
        if skipped:
            msg += f"; {len(skipped)} shape-skipped (e.g. {skipped[:3]})"
        print(msg)
    return params


def _to_plain(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return np.asarray(tree)


def export_random_keras_weights(
    path: str, variables: dict, stage_sizes=(3, 4, 6, 3),
    backbone_name: str = None, name_map: dict = None,
) -> None:
    """Write tdnet variables to an h5 in Keras naming — the round-trip half
    of the parity harness."""
    import h5py

    if name_map is None:
        name_map = (
            keras_name_map_for(backbone_name)
            if backbone_name
            else keras_name_map(stage_sizes)
        )
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
            p = get_path(params, path_)
            stats_p = get_path(stats, path_)
            if p is None and stats_p is None:
                continue
            lg = g.create_group(layer).create_group(layer)
            if p is not None and "kernel" in p:  # conv layer
                kernel = np.asarray(p["kernel"])
                if "conv_dw_" in layer:  # flax grouped (H,W,1,C) -> keras
                    lg.create_dataset(
                        "depthwise_kernel:0",
                        data=np.transpose(kernel, (0, 1, 3, 2)),
                    )
                else:
                    lg.create_dataset("kernel:0", data=kernel)
                if "bias" in p:
                    lg.create_dataset("bias:0", data=np.asarray(p["bias"]))
            elif p is not None and "scale" in p:  # batch norm
                lg.create_dataset("gamma:0", data=np.asarray(p["scale"]))
                lg.create_dataset("beta:0", data=np.asarray(p["bias"]))
                s = get_path(stats, path_)
                lg.create_dataset("moving_mean:0", data=np.asarray(s["mean"]))
                lg.create_dataset("moving_variance:0", data=np.asarray(s["var"]))
