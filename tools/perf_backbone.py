"""Per-stage backbone timing on TPU: stem / stage2..stage5 cumulative.

Isolates where ResNet-50's 73.5 ms (batch 32, 800x1344, bf16) goes, to
target the right optimization (e.g. space-to-depth stem vs stage tuning).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main() -> int:
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from tdnet.models.layers import FrozenBatchNorm
    from tdnet.models.resnet import STAGE_SIZES, Bottleneck

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    bucket = (800, 1344)
    dtype = jnp.bfloat16
    stage_sizes = STAGE_SIZES["resnet50"]

    class Partial(nn.Module):
        upto: int  # 0=stem, 1..4 = through stage2..stage5

        @nn.compact
        def __call__(self, x):
            x = x.astype(dtype)
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                        name="conv1")(x)
            x = nn.relu(FrozenBatchNorm(dtype=dtype, name="bn1")(x))
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            filters = 64
            for stage, num_blocks in enumerate(stage_sizes):
                if stage + 1 > self.upto:
                    break
                stride = 1 if stage == 0 else 2
                for block in range(num_blocks):
                    x = Bottleneck(
                        filters=filters,
                        stride=stride if block == 0 else 1,
                        projection=block == 0,
                        dtype=dtype,
                        use_block_kernel=os.environ.get(
                            "BENCH_BLOCK", "0") == "1",
                        name=f"stage{stage + 2}_block{block}",
                    )(x)
                filters *= 2
            return x.astype(jnp.float32).sum()

    x = np.random.RandomState(0).uniform(-116, 139, (batch,) + bucket + (3,))
    images = jax.device_put(jnp.asarray(x, jnp.float32))

    def timeit(model):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1,) + bucket + (3,), jnp.float32)
        )
        fn = jax.jit(model.apply)
        s = fn(variables, images)
        float(jax.device_get(s))
        inner = int(os.environ.get("BENCH_INNER", "32"))
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(inner):
                s = fn(variables, images)
            float(jax.device_get(s))
            times.append((time.perf_counter() - t0) / inner)
        return float(np.median(times)) * 1000

    prev = 0.0
    names = ["stem", "stage2", "stage3", "stage4", "stage5"]
    for upto, name in enumerate(names):
        ms = timeit(Partial(upto=upto))
        print(json.dumps({"through": name, "ms": round(ms, 2),
                          "delta_ms": round(ms - prev, 2)}))
        prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
