"""Served-throughput bench: tdnet-serve vs the raw device pipeline.

Round-3 verdict (weak #5c): the serving claim rested on one manual 111
ms/request drive. This tool measures sustained end-to-end THROUGHPUT
through the real HTTP server — micro-batching, JSON, socket and
host-preprocessing overheads included — at several --max-batch settings,
so BASELINE.md can state what fraction of bench.py's device-only rate the
serving front-end delivers.

Method: build_server on an ephemeral port with a Predictor at the product
shapes (800x1333 rule, bf16, device-normalize/fused-stem on TPU), then
`--clients` threads each fire `--requests` sequential POST /v1/detect
calls (npy body, one page per request) through a warm connection; the
steady-state window (after the first batch compiles) gives img/s. One
request = one image, so img/s = requests/s.

    JAX_COMPILATION_CACHE_DIR=/tmp/tdnet_jax_cache \
    python tools/bench_serve.py [--max-batch 16 64 128] [--clients 64]

Writes artifacts/bench_serve.json.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _page(rng, h=800, w=1200):
    """A synthetic document page (uint8 BGR float32, as a client would)."""
    img = np.full((h, w, 3), 248, np.uint8)
    for _ in range(3):
        x1, y1 = int(rng.randint(20, w // 2)), int(rng.randint(20, h // 2))
        x2, y2 = x1 + int(rng.randint(150, 400)), y1 + int(rng.randint(100, 300))
        img[y1:y2:14, x1:x2] = 90
        img[y1:y2, x1:x2:24] = 90
    return img


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--max-batch", type=int, nargs="+", default=[16, 64, 128])
    p.add_argument("--clients", type=int, default=64)
    p.add_argument("--requests", type=int, default=8,
                   help="requests per client thread (steady-state window)")
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--out", default="artifacts/bench_serve.json")
    p.add_argument("--f32-body", action="store_true",
                   help="send float32 npy bodies (the pre-round-5 client "
                        "behavior: 4x the bytes AND a server-side f32 round "
                        "trip under --device-normalize); default sends "
                        "uint8, which the round-5 server keeps end-to-end")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tdnet.bin.serve import build_server
    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.predictor import Predictor

    on_tpu = jax.default_backend() == "tpu"
    model = RetinaNet(num_classes=1,
                      dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                      output_dtype=None)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32))

    rng = np.random.RandomState(0)
    pages = [_page(rng) for _ in range(8)]
    if args.f32_body:
        pages = [p_.astype(np.float32) for p_ in pages]
    results = []
    for mb in args.max_batch:
        predictor = Predictor(
            model, variables, min_side=800, max_side=1333,
            score_threshold=0.05, device_preprocess=on_tpu,
            batch_size=mb,
        )
        httpd, batcher = build_server(
            predictor, port=0, max_batch=mb,
            max_delay_ms=args.max_delay_ms, default_threshold=0.05)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"

        def post(img, retries: int = 2):
            buf = io.BytesIO()
            np.save(buf, img)
            req = urllib.request.Request(
                base + "/v1/detect", data=buf.getvalue(),
                headers={"Content-Type": "application/x-npy"})
            for attempt in range(retries + 1):
                try:
                    with urllib.request.urlopen(req, timeout=600) as r:
                        return json.loads(r.read())
                except urllib.error.URLError:
                    if attempt == retries:
                        raise
                    time.sleep(0.2 * (attempt + 1))

        # warm: compile every sub-batch size the run will see
        post(pages[0])
        warm = [None] * args.clients

        def warm_worker(i):
            warm[i] = post(pages[i % len(pages)])

        ws = [threading.Thread(target=warm_worker, args=(i,))
              for i in range(args.clients)]
        for t in ws:
            t.start()
        for t in ws:
            t.join()

        # measured window
        n_total = args.clients * args.requests
        errs = []

        def worker(i):
            for k in range(args.requests):
                try:
                    post(pages[(i + k) % len(pages)])
                except Exception as exc:
                    errs.append(repr(exc))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        stats = batcher.stats()  # includes the host/device split ("device")
        httpd.shutdown()
        batcher.close()
        assert not errs, errs[:3]
        row = {
            "max_batch": mb,
            "img_per_s": round(n_total / dt, 1),
            "window_s": round(dt, 2),
            "requests": n_total,
            "mean_batch_size": stats["mean_batch_size"],
            "latency_ms": stats["latency_ms"],
            "fused_stem": stats["fused_stem"],
            "body": "f32" if args.f32_body else "uint8",
            "device": stats["device"],
        }
        results.append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"backend": jax.default_backend(),
                   "clients": args.clients,
                   "body": "f32" if args.f32_body else "uint8",
                   "results": results}, f, indent=1)
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
