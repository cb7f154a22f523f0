"""Anchor math golden tests — hand-computed values from SURVEY.md §3.

Mirrors the reference's tests/utils/test_anchors.py style: tiny shapes,
exact assertions.
"""

import numpy as np
import pytest

from tdnet.ops.anchors import (
    AnchorParameters,
    anchors_for_shape,
    generate_anchors,
    guess_shapes,
    shift,
)


def test_default_parameters():
    p = AnchorParameters.default
    assert list(p.sizes) == [32, 64, 128, 256, 512]
    assert list(p.strides) == [8, 16, 32, 64, 128]
    assert p.num_anchors == 9


def test_generate_anchors_area_and_aspect():
    base = 32.0
    anchors = generate_anchors(base_size=base)
    assert anchors.shape == (9, 4)
    ratios = np.repeat([0.5, 1.0, 2.0], 3)
    scales = np.tile([2 ** 0, 2 ** (1 / 3), 2 ** (2 / 3)], 3)
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    # area preserved per scale, aspect = ratio, zero-centered
    np.testing.assert_allclose(w * h, (base * scales) ** 2, rtol=1e-12)
    np.testing.assert_allclose(h / w, ratios, rtol=1e-12)
    np.testing.assert_allclose(anchors[:, 0], -anchors[:, 2], rtol=1e-12)
    np.testing.assert_allclose(anchors[:, 1], -anchors[:, 3], rtol=1e-12)


def test_generate_anchors_square_unit_scale():
    # ratio 1, scale 1 at base 32 must be exactly (-16,-16,16,16)
    anchors = generate_anchors(base_size=32.0)
    np.testing.assert_allclose(anchors[3], [-16, -16, 16, 16], atol=1e-9)


def test_guess_shapes_ceil_division():
    shapes = guess_shapes((800, 1333), [3, 4, 5, 6, 7])
    expect = [(100, 167), (50, 84), (25, 42), (13, 21), (7, 11)]
    for got, want in zip(shapes, expect):
        assert tuple(got) == want


def test_shift_grid_centers():
    base = np.array([[-1.0, -1.0, 1.0, 1.0]])
    out = shift((2, 3), 8, base)
    assert out.shape == (6, 4)
    # row-major over (y, x): first cell center (4, 4), second (12, 4)
    np.testing.assert_allclose(out[0], [3, 3, 5, 5])
    np.testing.assert_allclose(out[1], [11, 3, 13, 5])
    np.testing.assert_allclose(out[3], [3, 11, 5, 13])  # second row


def test_anchors_for_shape_count():
    a = anchors_for_shape((512, 512))
    expect = sum((512 // s) ** 2 * 9 for s in [8, 16, 32, 64, 128])
    assert a.shape == (expect, 4)
    # level-order: first anchors come from P3 (stride 8, first cell center 4)
    centers = (a[:9, 0::2].sum(axis=1) / 2, a[:9, 1::2].sum(axis=1) / 2)
    np.testing.assert_allclose(centers[0], 4.0, atol=1e-9)
    np.testing.assert_allclose(centers[1], 4.0, atol=1e-9)


def test_anchors_for_shape_cached_identity():
    a = anchors_for_shape((800, 1333))
    b = anchors_for_shape((800, 1333))
    assert a is b  # lru-cached per bucket
    assert not a.flags.writeable


def test_custom_anchor_parameters():
    p = AnchorParameters(sizes=(16,), strides=(8,), ratios=(1.0,), scales=(1.0,))
    a = anchors_for_shape((64, 64), pyramid_levels=[3], anchor_params=p)
    assert a.shape == (64, 4)
    np.testing.assert_allclose(a[0], [-4, -4, 12, 12])
