"""tdnet benchmark: batched 800x1333-class inference, images/sec/chip.

The north-star metric (BASELINE.json:2): RetinaNet ResNet-50+FPN batched
document-page inference with device-side decode+NMS, on one TPU chip.
The reference publishes no numbers (BASELINE.md), so the only external
anchor is the RetinaNet paper's ~122 ms/img on an M40 (~8.2 img/s);
vs_baseline is measured against that.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Default config (round 3): batch 128 (measured sweep peak: 273.1 img/s vs
258.4 @64, 261.9 @96, 262.3 @160, 262.4 @192), bf16, Pallas NMS, and
BENCH_STEM=1 — raw uint8 page canvases through the fused Pallas
ingest+stem kernel (the product's real ingest path, 4x less host->device
transfer; beats the prenormalized-f32 arm outright). Env overrides: BENCH_BATCH,
BENCH_ITERS (default 10), BENCH_DTYPE (bf16|f32), BENCH_PALLAS (1|0),
BENCH_STEM (1|0), BENCH_STEM_TM (default 4, measured best after the
second kernel pass: 273.1 vs 270.0 @tm=2, 267.4 @tm=8),
BENCH_FUSED=1 (flat-normalize uint8 arm, no stem fusion).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compile cache (first 800x1344 compile is minutes via the tunnel)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tdnet.models.detect import detections_from_outputs
    from tdnet.models.retinanet import RetinaNet

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    dtype = (
        jnp.bfloat16
        if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
        else jnp.float32
    )
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    backbone = os.environ.get("BENCH_BACKBONE", "resnet50")
    num_classes = int(os.environ.get("BENCH_CLASSES", "1"))
    # config 5 (multi-class page layout + soft-NMS): BENCH_SOFTNMS=<sigma>
    soft_nms_sigma = float(os.environ.get("BENCH_SOFTNMS", "0"))
    # landscape document-page bucket (data/generator.py); BENCH_BUCKET=HxW
    # overrides (e.g. 1024x1024 for the ResNet-101 config)
    bucket = tuple(
        int(v) for v in os.environ.get("BENCH_BUCKET", "800x1344").split("x")
    )

    # output_dtype=None: heads' native dtype at the boundary; the deferred
    # tail (models/detect.py) upcasts only the K candidates (bit-identical)
    # BENCH_BLOCK=1: identity bottlenecks via the fused VMEM-resident
    # Pallas block kernel (ops/pallas_block.py); same variables
    block_kernel = os.environ.get("BENCH_BLOCK", "0") == "1"
    model = RetinaNet(num_classes=num_classes, backbone_name=backbone,
                      dtype=dtype, output_dtype=None,
                      block_kernel=block_kernel)
    rng = jax.random.PRNGKey(0)
    init_images = jnp.zeros((1,) + bucket + (3,), jnp.float32)
    variables = jax.jit(model.init)(rng, init_images)

    # BENCH_FUSED=1: uint8 canvases normalized in-graph (config-2 ingestion;
    # 4x less host->device transfer). The uint8 batch crosses the jit
    # boundary as the FLAT (R, 3072) byte matrix — a (B,H,W,3) uint8 jit arg
    # gets the padded T(8,128) layout (42x blowup; +86 ms/step measured) —
    # and the Pallas kernel (ops/pallas_ingest.py) normalizes it on device.
    fused = os.environ.get("BENCH_FUSED", "0") == "1"
    # BENCH_STEM=1: fold ingestion INTO the stem (Pallas fused ingest+stem;
    # uint8 crosses the boundary as (B, H, W*3) packed rows and only the
    # pooled C=64 activations ever exist on device). BENCH_STEM_TM tunes
    # the kernel's row-block size.
    fused_stem = os.environ.get("BENCH_STEM", "1") == "1"
    stem_tm = int(os.environ.get("BENCH_STEM_TM", "4"))
    if fused_stem:
        from tdnet.models.retinanet import RetinaNet as _RN

        stem_model = _RN(
            num_classes=num_classes, backbone_name=backbone, dtype=dtype,
            stem_input=True, output_dtype=None, block_kernel=block_kernel,
        )

    @jax.jit
    def pipeline(variables, images):
        if fused_stem and images.dtype == jnp.uint8:
            from tdnet.models.resnet import stem_params_from_variables
            from tdnet.ops.pallas_stem import fused_stem_packed

            k7, inv, off = stem_params_from_variables(variables)
            act = fused_stem_packed(
                images, k7, inv, off, normalize="caffe", out_dtype=dtype,
                tm=stem_tm,
            )
            outputs = stem_model.apply(variables, act)
        else:
            if images.dtype == jnp.uint8:
                from tdnet.ops.pallas_ingest import normalize_uint8_flat

                images = normalize_uint8_flat(
                    images, "caffe", out_dtype=dtype
                ).reshape((batch,) + bucket + (3,))
            outputs = model.apply(variables, images)
        return detections_from_outputs(
            outputs, bucket, pre_nms_top_k=1024, use_pallas=use_pallas,
            soft_nms_sigma=soft_nms_sigma,
        )

    rng_np = np.random.RandomState(0)
    if fused_stem:
        # packed (B, H, W*3) byte rows for the fused ingest+stem kernel
        # (ops/pallas_ingest.pack_uint8_host is THE boundary convention)
        from tdnet.ops.pallas_ingest import pack_uint8_host

        x = rng_np.randint(0, 256, (batch,) + bucket + (3,), dtype=np.uint8)
        images = jax.device_put(jnp.asarray(pack_uint8_host(x)))
    elif fused:
        # config-2 ingestion: uint8 page canvases, normalize fused in-graph
        from tdnet.ops.pallas_ingest import pack_uint8_host

        x = rng_np.randint(0, 256, (batch,) + bucket + (3,), dtype=np.uint8)
        images = jax.device_put(jnp.asarray(pack_uint8_host(x, flat=True)))
    else:
        in_dtype = (
            jnp.bfloat16
            if os.environ.get("BENCH_INPUT", "f32") == "bf16"
            else jnp.float32
        )
        x = rng_np.uniform(-116, 139, (batch,) + bucket + (3,))
        images = jax.device_put(jnp.asarray(x, in_dtype))

    # compile + warmup. NOTE: on the tunneled axon platform
    # block_until_ready is not a reliable completion barrier — a host fetch
    # of an output (device_get) is; checksum also guards against DCE.
    try:
        det = pipeline(variables, images)
    except Exception as e:  # Mosaic compile flake (transient tunnel HTTP
        # 500s observed) — fall back to the prenormalized arm so the
        # benchmark always produces a number
        if not fused_stem:
            raise
        print(f"# fused-stem arm failed ({str(e)[:120]}); "
              "falling back to prenormalized_f32", file=sys.stderr)
        fused_stem = False
        x = rng_np.uniform(-116, 139, (batch,) + bucket + (3,))
        images = jax.device_put(jnp.asarray(x, jnp.float32))
        det = pipeline(variables, images)
    checksum = float(jax.device_get(det.scores).sum())
    det = pipeline(variables, images)
    jax.device_get(det.scores)

    # BENCH_PROFILE=<dir>: capture a profiler trace of a few steps (the
    # committed round trace artifacts under traces/ come from this)
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            for _ in range(3):
                det = pipeline(variables, images)
            jax.device_get(det.scores)

    # chain several dispatches per timed sample and fetch once, so the
    # tunnel round-trip amortizes instead of being counted per step
    # round-4 timing study: the fetch barrier costs ~33 ms RTT, so the
    # reported step carries +RTT/inner; 8 keeps the bias under ~1%
    inner = int(os.environ.get("BENCH_INNER", "8"))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner):
            det = pipeline(variables, images)
        jax.device_get(det.scores)
        times.append((time.perf_counter() - t0) / inner)

    dt = float(np.median(times))
    # the jitted pipeline runs on ONE default device (inputs are not
    # sharded); per-chip throughput is therefore batch/dt regardless of how
    # many devices happen to be visible
    ips = batch / dt

    paper_m40_ips = 1.0 / 0.122  # RetinaNet-50-800, Lin et al. 2017
    result = {
        "metric": f"retinanet_{backbone}_{bucket[0]}x{bucket[1]}_batched_inference",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / paper_m40_ips, 2),
        "batch": batch,
        "dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
        "nms": (
            f"soft_{soft_nms_sigma}" if soft_nms_sigma > 0
            else ("pallas" if use_pallas else "jnp")
        ),
        "ingestion": (
            "fused_stem_uint8" if fused_stem
            else ("fused_uint8" if fused else "prenormalized_f32")
        ),
        "block_kernel": block_kernel,
        "median_step_ms": round(dt * 1000, 2),
        "device": jax.devices()[0].device_kind,
        "checksum": round(checksum, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
