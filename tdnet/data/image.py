"""Host-side image IO and preprocessing.

Behavioral contract (SURVEY.md §3 "Preprocessing"; reference:
keras_retinanet/utils/image.py ~L1-230):

- channel order BGR; caffe normalization: subtract mean
  [103.939, 116.779, 123.68], NO scaling.
- resize: scale = min_side/ image min side (800 default); if the max side
  would exceed max_side (1333), scale = max_side / max side. cv2 bilinear.
- detections are divided by `scale` on the host afterwards.

Decode/augment/resize stay on the host (cv2/PIL is the right tool and the
work overlaps device compute via the prefetcher); normalization is cheap and
is ALSO exposed as a jnp function so the device-side fused path
(normalize+pad inside the jitted step) can be used for batched inference
(BASELINE.json north star: ingestion fuses into XLA ops).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # cv2 present in this image; PIL fallback for decode
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image

__all__ = [
    "CAFFE_MEAN_BGR",
    "read_image_bgr",
    "preprocess_image",
    "preprocess_image_device",
    "compute_resize_scale",
    "resize_image",
]

# reference: utils/image.py preprocess_image mode='caffe'
CAFFE_MEAN_BGR = np.array([103.939, 116.779, 123.68], dtype=np.float32)


def read_image_bgr(path) -> np.ndarray:
    """Read an image into (H, W, 3) uint8-ish float32 BGR
    (reference: utils/image.py read_image_bgr — PIL decode, RGB->BGR flip).

    The channel flip uses cv2's SIMD cvtColor on the uint8 array: an
    astype on the [:, :, ::-1] negative-stride view is an element-wise
    strided copy (measured 5.1 ms vs 0.9 ms per 1100x850 page — the
    loader's hottest line). Identical bytes out."""
    image = np.asarray(Image.open(path).convert("RGB"))
    if cv2 is not None:
        return cv2.cvtColor(image, cv2.COLOR_RGB2BGR).astype(np.float32)
    return image[:, :, ::-1].astype(np.float32)


_MEAN_ROW_CACHE: dict = {}


def preprocess_image(x: np.ndarray, mode: str = "caffe") -> np.ndarray:
    """Normalize a BGR float32 image in place-free fashion.

    mode='caffe': subtract ImageNet BGR means, no scaling (the only mode the
    reference's ResNet path uses). mode='tf': scale to [-1, 1].

    The caffe subtract runs on a (H, W*3) view against a width-tiled mean
    row: numpy's (H, W, 3) - (3,) broadcast loops 3 elements at a time
    (measured 5.6 ms vs 1.3 ms per page). Bit-identical results (same f32
    subtraction per element, just a longer inner loop).
    """
    x = np.asarray(x, np.float32)
    if mode == "caffe":
        if x.ndim == 3 and x.shape[-1] == 3 and x.flags.c_contiguous:
            h, w = x.shape[:2]
            row = _MEAN_ROW_CACHE.get(w)
            if row is None:
                row = _MEAN_ROW_CACHE[w] = np.tile(CAFFE_MEAN_BGR, w)
            return (x.reshape(h, w * 3) - row).reshape(h, w, 3)
        return x - CAFFE_MEAN_BGR
    if mode == "tf":
        return (x / 127.5) - 1.0
    raise ValueError(f"unknown preprocessing mode {mode!r}")


def preprocess_image_device(images, mode: str = "caffe", out_dtype=None):
    """Device-side normalization for the fused ingestion path
    (BASELINE.json config 2: resize/pad on host in uint8, normalize fused
    into the jitted graph — 4x less host->device traffic). Mathematically
    equivalent to host preprocessing up to uint8 rounding (mean-shift
    commutes with the linear warp/resize).

    uint8 input on TPU routes through the Pallas ingestion kernel
    (ops/pallas_ingest.py): XLA's own uint8->f32 lowering costs ~150 ms/step
    at batch 32 where the bandwidth roofline is ~2 ms (BASELINE.md round-2
    negative result); the kernel closes that gap. Other dtypes/backends use
    the plain jnp path (XLA fuses the subtract into the first conv).

    `out_dtype` (default float32): pass the model compute dtype (bf16) to
    fuse the downstream cast into the kernel's write — identical numerics
    to f32-normalize-then-cast (the subtract is exact in f32 either way).
    """
    import jax
    import jax.numpy as jnp

    out_dtype = out_dtype or jnp.float32
    if (
        images.dtype == jnp.uint8
        and jax.default_backend() == "tpu"
        and images.ndim == 4
    ):
        from tdnet.ops.pallas_ingest import normalize_uint8, supports_shape

        if supports_shape(images.shape):
            return normalize_uint8(images, mode=mode, out_dtype=out_dtype)

    x = images.astype(jnp.float32)
    if mode == "caffe":
        return (x - jnp.asarray(CAFFE_MEAN_BGR)).astype(out_dtype)
    if mode == "tf":
        return ((x / 127.5) - 1.0).astype(out_dtype)
    raise ValueError(f"unknown preprocessing mode {mode!r}")


def compute_resize_scale(
    image_shape: Tuple[int, ...], min_side: int = 800, max_side: int = 1333
) -> float:
    """Aspect-preserving scale (reference: utils/image.py compute_resize_scale)."""
    rows, cols = image_shape[:2]
    smallest_side = min(rows, cols)
    scale = min_side / smallest_side
    largest_side = max(rows, cols)
    if largest_side * scale > max_side:
        scale = max_side / largest_side
    return scale


def resize_image(img: np.ndarray, min_side: int = 800, max_side: int = 1333):
    """Resize so min side == min_side (capped by max_side). Returns
    (image, scale); boxes scale by the same factor
    (reference: utils/image.py resize_image, cv2 bilinear)."""
    scale = compute_resize_scale(img.shape, min_side=min_side, max_side=max_side)
    if scale == 1.0:
        return img, 1.0
    if cv2 is not None:
        img = cv2.resize(img, None, fx=scale, fy=scale)  # bilinear default
    else:  # pragma: no cover
        h, w = img.shape[:2]
        out = Image.fromarray(img.astype(np.uint8)).resize(
            (int(round(w * scale)), int(round(h * scale))), Image.BILINEAR
        )
        img = np.asarray(out, dtype=np.float32)
    return img, scale
