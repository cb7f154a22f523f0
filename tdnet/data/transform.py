"""Affine augmentation (host-side numpy; reference: utils/transform.py ~L1-270).

All transforms are 3x3 homogeneous matrices composed as
rotation @ translation @ shear @ scaling @ flip, with translation relative to
image size and the whole transform re-centered on the image center
(reference: random_transform, adjust_transform_for_image). Boxes map through
transform_aabb (transform the 4 corners, take the enclosing AABB).

Deterministic under a seeded numpy RandomState (the reference's DEFAULT_PRNG
pattern) — property-tested like the reference's tests/utils/test_transform.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

DEFAULT_PRNG = np.random.RandomState()

__all__ = [
    "DEFAULT_PRNG",
    "rotation",
    "translation",
    "shear",
    "scaling",
    "random_flip",
    "change_transform_origin",
    "random_transform",
    "random_transform_generator",
    "adjust_transform_for_image",
    "transform_aabb",
    "TransformParameters",
    "apply_transform",
]


def rotation(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)


def translation(t) -> np.ndarray:
    return np.array([[1, 0, t[0]], [0, 1, t[1]], [0, 0, 1]], dtype=np.float64)


def shear(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[1, -s, 0], [0, c, 0], [0, 0, 1]], dtype=np.float64)


def scaling(f) -> np.ndarray:
    return np.array([[f[0], 0, 0], [0, f[1], 0], [0, 0, 1]], dtype=np.float64)


def _uniform_vector(lo, hi, prng) -> np.ndarray:
    lo, hi = np.asarray(lo, np.float64), np.asarray(hi, np.float64)
    return prng.uniform(lo, hi)


def random_flip(flip_x_chance: float, flip_y_chance: float, prng=DEFAULT_PRNG) -> np.ndarray:
    fx = prng.uniform(0, 1) < flip_x_chance
    fy = prng.uniform(0, 1) < flip_y_chance
    return scaling((-1 if fx else 1, -1 if fy else 1))


def change_transform_origin(transform: np.ndarray, center) -> np.ndarray:
    center = np.asarray(center, np.float64)
    return np.linalg.multi_dot(
        [translation(center), transform, translation(-center)]
    )


def random_transform(
    min_rotation: float = 0,
    max_rotation: float = 0,
    min_translation=(0, 0),
    max_translation=(0, 0),
    min_shear: float = 0,
    max_shear: float = 0,
    min_scaling=(1, 1),
    max_scaling=(1, 1),
    flip_x_chance: float = 0,
    flip_y_chance: float = 0,
    prng=DEFAULT_PRNG,
) -> np.ndarray:
    return np.linalg.multi_dot(
        [
            rotation(prng.uniform(min_rotation, max_rotation)),
            translation(_uniform_vector(min_translation, max_translation, prng)),
            shear(prng.uniform(min_shear, max_shear)),
            scaling(_uniform_vector(min_scaling, max_scaling, prng)),
            random_flip(flip_x_chance, flip_y_chance, prng),
        ]
    )


def random_transform_generator(prng=None, **kwargs):
    """Infinite generator of random transforms (reference:
    random_transform_generator; `--random-transform` training defaults live
    in bin/train.py)."""
    if prng is None:
        prng = np.random.RandomState()
    while True:
        yield random_transform(prng=prng, **kwargs)


def adjust_transform_for_image(
    transform: np.ndarray, image: np.ndarray, relative_translation: bool = True
) -> np.ndarray:
    """Scale relative translation by image size and move the transform origin
    to the image center."""
    height, width = image.shape[:2]
    result = transform.copy()
    if relative_translation:
        result[0:2, 2] *= [width, height]
    return change_transform_origin(result, (0.5 * width, 0.5 * height))


def transform_aabb(transform: np.ndarray, aabb) -> np.ndarray:
    """Transform an axis-aligned box and return the enclosing AABB."""
    x1, y1, x2, y2 = aabb
    points = transform.dot(
        np.array(
            [[x1, x2, x1, x2], [y1, y2, y2, y1], [1, 1, 1, 1]], dtype=np.float64
        )
    )
    min_corner = points.min(axis=1)
    max_corner = points.max(axis=1)
    return np.array([min_corner[0], min_corner[1], max_corner[0], max_corner[1]])


@dataclass
class TransformParameters:
    """warpAffine parameters (reference: utils/image.py TransformParameters)."""

    fill_mode: str = "nearest"
    interpolation: str = "linear"
    cval: float = 0.0
    relative_translation: bool = True

    def cv_border_mode(self):
        return {
            "constant": cv2.BORDER_CONSTANT,
            "nearest": cv2.BORDER_REPLICATE,
            "reflect": cv2.BORDER_REFLECT_101,
            "wrap": cv2.BORDER_WRAP,
        }[self.fill_mode]

    def cv_interpolation(self):
        return {
            "nearest": cv2.INTER_NEAREST,
            "linear": cv2.INTER_LINEAR,
            "cubic": cv2.INTER_CUBIC,
            "area": cv2.INTER_AREA,
            "lanczos4": cv2.INTER_LANCZOS4,
        }[self.interpolation]


def apply_transform(
    matrix: np.ndarray, image: np.ndarray, params: TransformParameters
) -> np.ndarray:
    """Warp an image by an affine matrix (reference: utils/image.py
    apply_transform — cv2.warpAffine, output size unchanged)."""
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 unavailable; augmentation requires OpenCV")
    return cv2.warpAffine(
        image,
        matrix[:2, :],
        dsize=(image.shape[1], image.shape[0]),
        flags=params.cv_interpolation(),
        borderMode=params.cv_border_mode(),
        borderValue=params.cval,
    )
