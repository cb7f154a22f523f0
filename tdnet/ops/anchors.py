"""Anchor generation (trace-time, numpy).

Behavioral contract (SURVEY.md §3 "Anchors"; reference:
keras_retinanet/utils/anchors.py ~L1-290):

- pyramid levels 3..7, sizes [32,64,128,256,512], strides [8,16,32,64,128],
  ratios [0.5,1,2], scales [2^0, 2^(1/3), 2^(2/3)]  -> 9 anchors/cell.
- per-level feature shape: (image_shape + 2^lvl - 1) // 2^lvl.
- base anchors: zero-centered, area size^2 * scale^2 at each ratio with
  w = sqrt(area/ratio), h = w*ratio; ratio-major / scale-minor ordering.
- grid shifts at centers (i + 0.5) * stride, row-major over (y, x) with the
  9 base anchors innermost; levels concatenated P3 -> P7.

Anchors depend only on the (static, bucketed) padded image shape, so they are
computed once per shape on the host in float64 and baked into the jitted graph
as constants — there is nothing to gain from generating them on the TPU every
step. (The reference recomputes them per batch on the host; reference:
keras_retinanet/preprocessing/generator.py compute_targets.)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import numpy as np

__all__ = [
    "AnchorParameters",
    "generate_anchors",
    "guess_shapes",
    "shift",
    "anchors_for_shape",
]


def _default_ratios() -> np.ndarray:
    return np.array([0.5, 1.0, 2.0], dtype=np.float64)


def _default_scales() -> np.ndarray:
    return np.array([2.0 ** 0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0)], dtype=np.float64)


@dataclass(frozen=True)
class AnchorParameters:
    """Anchor configuration (reference: utils/anchors.py AnchorParameters)."""

    sizes: tuple = (32, 64, 128, 256, 512)
    strides: tuple = (8, 16, 32, 64, 128)
    ratios: tuple = (0.5, 1.0, 2.0)
    scales: tuple = (2.0 ** 0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0))

    @property
    def num_anchors(self) -> int:
        return len(self.ratios) * len(self.scales)


# `AnchorParameters.default` mirrors the reference's class-level default.
AnchorParameters.default = AnchorParameters()


def generate_anchors(
    base_size: float = 16.0,
    ratios: Sequence[float] | None = None,
    scales: Sequence[float] | None = None,
) -> np.ndarray:
    """Zero-centered base anchors (num_ratios*num_scales, 4) as (x1, y1, x2, y2).

    Ratio-major, scale-minor ordering; w = sqrt(area / ratio), h = w * ratio,
    matching the reference's generate_anchors (utils/anchors.py).
    """
    ratios = _default_ratios() if ratios is None else np.asarray(ratios, dtype=np.float64)
    scales = _default_scales() if scales is None else np.asarray(scales, dtype=np.float64)

    num_anchors = len(ratios) * len(scales)
    anchors = np.zeros((num_anchors, 4), dtype=np.float64)

    # widths/heights start as base_size * scale, tiled scale-minor.
    anchors[:, 2:] = base_size * np.tile(scales, (2, len(ratios))).T

    areas = anchors[:, 2] * anchors[:, 3]
    anchors[:, 2] = np.sqrt(areas / np.repeat(ratios, len(scales)))
    anchors[:, 3] = anchors[:, 2] * np.repeat(ratios, len(scales))

    # center on the origin: (x1, y1, x2, y2) = (-w/2, -h/2, w/2, h/2)
    anchors[:, 0::2] -= np.tile(anchors[:, 2] * 0.5, (2, 1)).T
    anchors[:, 1::2] -= np.tile(anchors[:, 3] * 0.5, (2, 1)).T
    return anchors


def guess_shapes(image_shape: Sequence[int], pyramid_levels: Sequence[int]) -> list:
    """Per-level feature shapes: ceil-divide the image shape by 2^level."""
    image_shape = np.array(image_shape[:2])
    return [(image_shape + 2 ** x - 1) // (2 ** x) for x in pyramid_levels]


def shift(feature_shape: Sequence[int], stride: int, anchors: np.ndarray) -> np.ndarray:
    """Tile base anchors over a feature grid.

    Grid centers are at (i + 0.5) * stride; output is row-major over (y, x)
    with the base anchors innermost — (H*W*A, 4).
    """
    shift_x = (np.arange(0, feature_shape[1], dtype=np.float64) + 0.5) * stride
    shift_y = (np.arange(0, feature_shape[0], dtype=np.float64) + 0.5) * stride
    shift_x, shift_y = np.meshgrid(shift_x, shift_y)

    shifts = np.vstack(
        (shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel())
    ).transpose()

    a = anchors.shape[0]
    k = shifts.shape[0]
    all_anchors = anchors.reshape((1, a, 4)) + shifts.reshape((k, 1, 4))
    return all_anchors.reshape((k * a, 4))


@functools.lru_cache(maxsize=64)
def _anchors_for_shape_cached(
    image_shape: tuple,
    pyramid_levels: tuple,
    sizes: tuple,
    strides: tuple,
    ratios: tuple,
    scales: tuple,
) -> np.ndarray:
    image_shapes = guess_shapes(image_shape, pyramid_levels)
    all_anchors = np.zeros((0, 4), dtype=np.float64)
    for idx in range(len(pyramid_levels)):
        base = generate_anchors(base_size=sizes[idx], ratios=ratios, scales=scales)
        shifted = shift(image_shapes[idx], strides[idx], base)
        all_anchors = np.append(all_anchors, shifted, axis=0)
    all_anchors.setflags(write=False)
    return all_anchors


def anchors_for_shape(
    image_shape: Sequence[int],
    pyramid_levels: Sequence[int] | None = None,
    anchor_params: AnchorParameters | None = None,
) -> np.ndarray:
    """All anchors for an image shape, concatenated P3->P7 — (N, 4) float64.

    Cached per (shape, params): shapes are bucketed (data/generator.py) so the
    same few arrays are reused for the whole run.
    """
    if pyramid_levels is None:
        pyramid_levels = (3, 4, 5, 6, 7)
    if anchor_params is None:
        anchor_params = AnchorParameters.default
    return _anchors_for_shape_cached(
        tuple(int(s) for s in image_shape[:2]),
        tuple(pyramid_levels),
        tuple(anchor_params.sizes),
        tuple(anchor_params.strides),
        tuple(float(r) for r in anchor_params.ratios),
        tuple(float(s) for s in anchor_params.scales),
    )
