"""Preprocess/resize/transform tests (reference: tests/utils/test_transform.py
property style + §3 preprocessing contract)."""

import numpy as np
import pytest

from tdnet.data.image import (
    CAFFE_MEAN_BGR,
    compute_resize_scale,
    preprocess_image,
    resize_image,
)
from tdnet.data.transform import (
    adjust_transform_for_image,
    change_transform_origin,
    random_transform,
    random_transform_generator,
    rotation,
    scaling,
    transform_aabb,
    translation,
)


def test_preprocess_caffe_mean_subtraction_no_scaling():
    x = np.full((2, 2, 3), 150.0, dtype=np.float32)
    y = preprocess_image(x, mode="caffe")
    np.testing.assert_allclose(y[0, 0], 150.0 - CAFFE_MEAN_BGR, rtol=1e-6)


def test_preprocess_unknown_mode():
    with pytest.raises(ValueError, match="unknown preprocessing mode"):
        preprocess_image(np.zeros((1, 1, 3)), mode="torch")


def test_resize_scale_min_side():
    # 400x600 -> scale 2.0 (min side 400 -> 800), max side 1200 <= 1333
    assert compute_resize_scale((400, 600)) == pytest.approx(2.0)


def test_resize_scale_capped_by_max_side():
    # 400x800: min-side scale 2.0 would give max 1600 > 1333 -> 1333/800
    assert compute_resize_scale((400, 800)) == pytest.approx(1333 / 800)


def test_resize_image_applies_scale():
    img = np.zeros((100, 150, 3), dtype=np.float32)
    out, scale = resize_image(img, min_side=50, max_side=1000)
    assert scale == pytest.approx(0.5)
    assert out.shape == (50, 75, 3)


def test_rotation_90_degrees():
    t = rotation(np.pi / 2)
    np.testing.assert_allclose(t @ [1, 0, 1], [0, 1, 1], atol=1e-12)


def test_translation_matrix():
    np.testing.assert_allclose(translation((3, 4)) @ [1, 1, 1], [4, 5, 1])


def test_change_transform_origin_fixes_center():
    t = change_transform_origin(scaling((2, 2)), (10, 10))
    np.testing.assert_allclose(t @ [10, 10, 1], [10, 10, 1])  # center fixed
    np.testing.assert_allclose(t @ [12, 10, 1], [14, 10, 1])


def test_transform_aabb_rotation_bounds():
    # rotate a box 90° about origin: (1,1,3,2) -> x in [-2,-1], y in [1,3]
    t = rotation(np.pi / 2)
    out = transform_aabb(t, (1, 1, 3, 2))
    np.testing.assert_allclose(out, [-2, 1, -1, 3], atol=1e-12)


def test_transform_aabb_identity():
    t = np.eye(3)
    np.testing.assert_allclose(transform_aabb(t, (1, 2, 3, 4)), [1, 2, 3, 4])


def test_random_transform_deterministic_with_seed():
    a = random_transform(min_rotation=-0.5, max_rotation=0.5,
                         prng=np.random.RandomState(42))
    b = random_transform(min_rotation=-0.5, max_rotation=0.5,
                         prng=np.random.RandomState(42))
    np.testing.assert_array_equal(a, b)


def test_random_transform_generator_stream():
    gen = random_transform_generator(
        prng=np.random.RandomState(0), flip_x_chance=0.5
    )
    mats = [next(gen) for _ in range(8)]
    # flips appear both ways over the stream
    dets = {round(float(np.linalg.det(m))) for m in mats}
    assert dets == {-1, 1}


def test_adjust_transform_relative_translation():
    img = np.zeros((100, 200, 3))
    t = adjust_transform_for_image(translation((0.1, 0.1)), img, True)
    # relative (0.1, 0.1) on 200x100 -> absolute (20, 10)
    moved = t @ [0, 0, 1]
    np.testing.assert_allclose(moved[:2], [20, 10])
