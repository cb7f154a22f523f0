"""Feasibility probe: does XLA on this TPU lower int8 conv/matmul to the
MXU at the expected ~2x bf16 rate?

Times s8xs8->s32 vs bf16 `lax.conv_general_dilated` and `dot_general` at
stage-4-like shapes. If int8 convs run ~2x bf16 (and not through some slow
emulation), a post-training-quantization inference path is worth building;
if not, document the negative result and stop.

Run: python tools/probe_int8.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timed


def main():
    r = np.random.RandomState(0)
    b = int(os.environ.get("INT8_BATCH", "32"))

    # stage4-like conv: 50x84 spatial, 256->256 3x3 (the FLOP-heavy class)
    hw = (50, 84)
    cin = cout = 256
    x8 = jnp.asarray(r.randint(-127, 128, (b, *hw, cin), np.int8))
    k8 = jnp.asarray(r.randint(-127, 128, (3, 3, cin, cout), np.int8))
    xb = x8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)

    def conv(x, k, acc):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )

    @jax.jit
    def conv_bf16(x, k):
        return conv(x, k, jnp.float32)

    @jax.jit
    def conv_int8(x, k):
        return conv(x, k, jnp.int32)

    # head-tower-like dot: (B*HW, 256) @ (256, 256)
    m = b * hw[0] * hw[1]
    a8 = jnp.asarray(r.randint(-127, 128, (m, cin), np.int8))
    w8 = jnp.asarray(r.randint(-127, 128, (cin, cout), np.int8))

    @jax.jit
    def dot_bf16(a, w):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @jax.jit
    def dot_int8(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    # int8 conv + requantize epilogue (the real per-layer pattern)
    scale = jnp.asarray(r.uniform(0.01, 0.02, cout).astype(np.float32))

    @jax.jit
    def conv_int8_requant(x, k):
        y = conv(x, k, jnp.int32)
        y = jnp.maximum(y.astype(jnp.float32) * scale, 0.0)
        q = jnp.clip(jnp.round(y * 8.0), -127, 127).astype(jnp.int8)
        return q

    gflop_conv = 2 * b * hw[0] * hw[1] * 9 * cin * cout / 1e9
    gflop_dot = 2 * m * cin * cout / 1e9

    for name, fn, args, gf in [
        ("conv bf16", conv_bf16, (xb, kb), gflop_conv),
        ("conv int8->int32", conv_int8, (x8, k8), gflop_conv),
        ("conv int8 + requant", conv_int8_requant, (x8, k8), gflop_conv),
        ("dot bf16", dot_bf16, (a8, w8), gflop_dot),
        ("dot int8->int32", dot_int8, (a8, w8), gflop_dot),
    ]:
        try:
            ms = timed(fn, *args)
            print(f"{name:22s} {ms:8.3f} ms  {gf / ms:8.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"{name:22s} FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
