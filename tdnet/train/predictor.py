"""Host-facing predictor: raw page image -> detections in original coords.

Mirrors the reference inference call stack (SURVEY.md §4.2): preprocess ->
resize -> forward -> decode -> clip -> NMS on device, then `boxes /= scale`
on the host. Images are padded into shape buckets so the jitted pipeline
compiles once per bucket; per-bucket executables are cached on the instance.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdnet.data.generator import default_buckets, pick_bucket
from tdnet.data.image import preprocess_image, resize_image
from tdnet.models.detect import detections_from_outputs
from tdnet.ops.anchors import AnchorParameters

__all__ = ["Predictor"]


class Predictor:
    def __init__(
        self,
        model,
        variables: dict,
        anchor_params: Optional[AnchorParameters] = None,
        min_side: int = 800,
        max_side: int = 1333,
        buckets=None,
        preprocess_mode: str = "caffe",
        score_threshold: float = 0.05,
        max_detections: int = 300,
        nms_threshold: float = 0.5,
        nms: bool = True,
        class_specific_filter: bool = True,
        pre_nms_top_k: int = 1024,
        use_pallas: Optional[bool] = None,
        soft_nms_sigma: float = 0.0,
        device_preprocess: bool = False,
        batch_size: Optional[int] = None,
        fused_stem: Optional[bool] = None,
    ):
        # deferred tail (the nms + class-specific default): keep the heads'
        # native dtype at the model boundary — the tail upcasts only the K
        # candidates to f32, bit-identical to casting everything (tested in
        # tests/ops/test_deferred_tail.py), and the boundary cast plus half
        # the top-k/gather traffic disappear
        if (nms and class_specific_filter
                and getattr(model, "output_dtype", None) is not None):
            model = model.clone(output_dtype=None)
        self.model = model
        # predict_batch batch size: the per-image reference loop (§4.3) left
        # ~30x throughput on the table on TPU; default to batched eval there
        if batch_size is None:
            batch_size = 16 if jax.default_backend() == "tpu" else 1
        self.batch_size = batch_size
        # commit weights to device ONCE — numpy leaves (e.g. fresh from a
        # .tdn load) would otherwise re-upload ~150MB on every jitted call
        # (assignment goes through the `variables` property below)
        self.variables = variables
        self.anchor_params = anchor_params
        self.min_side = min_side
        self.max_side = max_side
        self.buckets = buckets or default_buckets(min_side, max_side)
        self.preprocess_mode = preprocess_mode
        # ship uint8, normalize in-graph (fused ingestion; BASELINE config 2)
        self.device_preprocess = device_preprocess
        # fused ingest+stem Pallas kernel (ops/pallas_stem.py): uint8 crosses
        # the boundary as packed (B, H, W*3) rows, the kernel emits pooled
        # C=64 stem activations, and the model runs from there (stem_input).
        # Measured v5e batch 32 at 800x1344: 127.4 ms/step vs 131.2
        # prenormalized-f32 and 185 flat-normalize — uint8 ingestion becomes
        # FREE. None -> auto: on when the backbone is a ResNet, the mode is
        # caffe/tf, device_preprocess is set, and the backend is TPU (the
        # interpret-mode kernel is correct but slow elsewhere).
        if fused_stem is None:
            fused_stem = (
                device_preprocess
                and jax.default_backend() == "tpu"
                and getattr(model, "backbone_name", "").lstrip("se").startswith("resnet")
                and preprocess_mode in ("caffe", "tf")
                and not getattr(model, "stem_input", False)
            )
        self.fused_stem = fused_stem
        # fused identity-bottleneck Pallas kernel (ops/pallas_block.py):
        # inference-only, same variables. Measured composition-NEUTRAL
        # end-to-end (2x faster isolated, ~0 in-graph — XLA's scheduler
        # already hides the per-block emitter losses; PERF.md round 5),
        # so the default is OFF; TDNET_BLOCK_KERNEL=1 opts in for A/B.
        import os as _os

        if (_os.environ.get("TDNET_BLOCK_KERNEL", "0") == "1"
                and jax.default_backend() == "tpu"
                and getattr(model, "backbone_name", "").startswith("resnet")
                and hasattr(model, "block_kernel")
                and not getattr(model, "block_kernel", False)):
            model = model.clone(block_kernel=True)
            self.model = model
        # set to "<ExcType>: <msg>" if the fused-stem pipeline ever fails
        # at dispatch and the predictor permanently switches to the
        # flat-normalize path (surfaced in tdnet-serve /stats)
        self.fused_stem_fallback = None
        # cumulative host-prep vs device-dispatch seconds (tdnet-serve
        # /stats reads these to make the host/device split observable —
        # the serve bench measured the 1-core host as the bottleneck and
        # this is the counter that proves/refutes it per deployment).
        # "dispatch" = jitted call + result fetch (the fetch is the
        # device+transfer barrier; the enqueue itself is async).
        self.host_prep_s = 0.0
        self.dispatch_s = 0.0
        self.dispatch_count = 0
        self.dispatch_images = 0
        self._stem_model = model.clone(stem_input=True) if fused_stem else None
        self.det_kwargs = dict(
            score_threshold=score_threshold,
            max_detections=max_detections,
            nms_threshold=nms_threshold,
            nms=nms,
            class_specific_filter=class_specific_filter,
            pre_nms_top_k=pre_nms_top_k,
            use_pallas=use_pallas,
            soft_nms_sigma=soft_nms_sigma,
        )

    @staticmethod
    def _local_leaf(x):
        # Multi-host: the train state lives on the GLOBAL mesh, so its
        # leaves are not fully addressable from one process and cannot be
        # fed to this predictor's process-local jit. The params are
        # replicated (parallel/mesh.py replicated_sharding), so the local
        # shard IS the full value — materialize it. Single-process arrays
        # (incl. the virtual 8-device mesh) pass through untouched.
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return x

    @property
    def variables(self) -> dict:
        return self._variables

    @variables.setter
    def variables(self, tree: dict) -> None:
        self._variables = jax.device_put(jax.tree.map(self._local_leaf, tree))

    def _pipeline(self, bucket: Tuple[int, int]):
        """jitted images(1,H,W,3) -> Detections for one bucket shape.

        Cached per instance (a class-level lru_cache would key on self and
        pin dead predictors' device weights alive)."""
        cache = self.__dict__.setdefault("_pipeline_cache", {})
        if bucket in cache:
            return cache[bucket]

        @jax.jit
        def run(variables, images):
            if images.dtype == jnp.uint8 and images.ndim == 3:
                # packed (B, H, W*3) byte rows -> fused ingest+stem kernel
                # -> model from the pooled stem activations
                from tdnet.models.resnet import stem_params_from_variables
                from tdnet.ops.pallas_stem import fused_stem_packed

                k7, inv, off = stem_params_from_variables(variables)
                act = fused_stem_packed(
                    images, k7, inv, off, normalize=self.preprocess_mode,
                    out_dtype=getattr(self.model, "dtype", None) or jnp.float32,
                )
                outputs = self._stem_model.apply(variables, act)
                return detections_from_outputs(
                    outputs, bucket, anchor_params=self.anchor_params,
                    **self.det_kwargs
                )
            if images.dtype == jnp.uint8 and images.ndim == 2:
                # flat (R, 3072) byte matrix across the jit boundary — a
                # (B,H,W,3) uint8 jit ARG gets the padded T(8,128) layout
                # (C: 3->128, 42x physical blowup; +86 ms/step measured at
                # batch 32) — normalized by the Pallas ingest kernel
                from tdnet.ops.pallas_ingest import normalize_uint8_flat

                b = images.shape[0] * images.shape[1] // (
                    bucket[0] * bucket[1] * 3
                )
                images = normalize_uint8_flat(
                    images, self.preprocess_mode,
                    out_dtype=getattr(self.model, "dtype", None) or jnp.float32,
                ).reshape((b,) + tuple(bucket) + (3,))
            elif images.dtype == jnp.uint8:
                from tdnet.data.image import preprocess_image_device

                images = preprocess_image_device(
                    images, self.preprocess_mode,
                    out_dtype=getattr(self.model, "dtype", None),
                )
            outputs = self.model.apply(variables, images)
            return detections_from_outputs(
                outputs, bucket, anchor_params=self.anchor_params, **self.det_kwargs
            )

        cache[bucket] = run
        return run

    def _prepare(self, image_bgr: np.ndarray):
        """Host preprocess one raw BGR image -> (canvas (H,W,3), scale, bucket)."""
        if self.device_preprocess:
            x, scale = resize_image(
                image_bgr, min_side=self.min_side, max_side=self.max_side
            )
            h, w = x.shape[:2]
            bucket = tuple(pick_bucket(h, w, self.buckets))
            # pad with the mean pixel so in-graph normalization maps the
            # padding to ~0, matching the host path (which pads after
            # normalization with zeros)
            if self.preprocess_mode == "caffe":
                from tdnet.data.image import CAFFE_MEAN_BGR

                fill = np.round(CAFFE_MEAN_BGR).astype(np.uint8)
            else:
                fill = np.uint8(128)
            canvas = np.full((bucket[0], bucket[1], 3), fill, dtype=np.uint8)
            canvas[:h, :w, :] = np.clip(x, 0, 255).astype(np.uint8)
        else:
            x = preprocess_image(image_bgr, mode=self.preprocess_mode)
            x, scale = resize_image(x, min_side=self.min_side, max_side=self.max_side)
            h, w = x.shape[:2]
            bucket = tuple(pick_bucket(h, w, self.buckets))
            canvas = np.zeros((bucket[0], bucket[1], 3), dtype=np.float32)
            canvas[:h, :w, :] = x
        return canvas, scale, bucket

    def __call__(self, image_bgr: np.ndarray):
        """Predict on one raw float32 BGR image. Returns (boxes (D,4),
        scores (D,), labels (D,)) in original image coordinates, -1-padded."""
        return self.predict_batch([image_bgr])[0]

    def predict_batch(self, images_bgr):
        """Predict on a list of raw BGR images with one device dispatch per
        shape bucket (the batched replacement for the reference's per-image
        predict_on_batch loop, SURVEY.md §4.3). Returns a list of
        (boxes, scores, labels) aligned with the input order."""
        import time as _time

        t0 = _time.monotonic()
        prepped = [self._prepare(img) for img in images_bgr]
        groups: dict = {}
        for i, (_, _, bucket) in enumerate(prepped):
            groups.setdefault(bucket, []).append(i)

        out = [None] * len(prepped)
        for bucket, idxs in groups.items():
            # pad the sub-batch up to a power of two so each bucket compiles
            # at most log2(max batch)+1 executables regardless of chunk sizes
            n = len(idxs)
            padded_n = 1 << (n - 1).bit_length() if n > 1 else 1
            stack = np.stack(
                [prepped[i][0] for i in idxs]
                + [prepped[idxs[0]][0]] * (padded_n - n)
            )
            if stack.dtype == np.uint8 and self.fused_stem:
                from tdnet.ops.pallas_stem import supports_shape

                if supports_shape(stack.shape):
                    from tdnet.ops.pallas_ingest import pack_uint8_host

                    # packed rows for the fused ingest+stem kernel
                    stack = pack_uint8_host(stack)
            if stack.dtype == np.uint8 and stack.ndim == 4:
                from tdnet.ops.pallas_ingest import pack_uint8_host

                # flat rows for the normalize kernel (falls back to packed
                # rows on odd buckets); see pack_uint8_host for the trap
                stack = pack_uint8_host(stack, flat=True)
            t_disp = _time.monotonic()
            self.host_prep_s += t_disp - t0
            try:
                det = self._pipeline(bucket)(self.variables, jnp.asarray(stack))
            except Exception as exc:
                if not (self.fused_stem and stack.ndim == 3):
                    raise
                if isinstance(exc, (TypeError, ValueError, KeyError,
                                    AttributeError, AssertionError)):
                    # a shape/params/programming bug, not a transport flake
                    # — surface it instead of silently changing kernels
                    raise
                # transient Mosaic/tunnel compile flakes (HTTP 500) observed
                # on this platform — fall back to the flat-normalize path
                # permanently for this predictor rather than failing eval.
                # Loud: a real kernel/params bug would otherwise be masked
                # by silently switching implementations mid-eval; the state
                # is also surfaced in tdnet-serve's /stats
                # (fused_stem_fallback).
                import sys as _sys

                print(
                    "tdnet: fused-stem pipeline failed "
                    f"({type(exc).__name__}: {exc}); falling back to the "
                    "flat-normalize path for this predictor",
                    file=_sys.stderr,
                )
                self.fused_stem = False
                self.fused_stem_fallback = f"{type(exc).__name__}: {exc}"
                if stack.size % 3072 == 0:
                    flat = stack.reshape(-1, 3072)
                else:  # odd custom bucket: NHWC uint8 fallback
                    flat = stack.reshape(stack.shape[:2] + (-1, 3))
                det = self._pipeline(bucket)(self.variables, jnp.asarray(flat))
            boxes = np.asarray(det.boxes, np.float64)
            scores = np.asarray(det.scores, np.float64)
            labels = np.asarray(det.labels, np.int64)
            t0 = _time.monotonic()  # next group's prep (and the rescale
            self.dispatch_s += t0 - t_disp  # tail) counts as host time
            self.dispatch_count += 1
            self.dispatch_images += len(idxs)
            for j, i in enumerate(idxs):
                b, s, l = boxes[j], scores[j], labels[j]
                b[s > -1] /= prepped[i][1]  # host-side rescale (reference §4.2)
                out[i] = (b, s, l)
        return out
