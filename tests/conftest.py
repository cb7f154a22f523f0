"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
--xla_force_host_platform_device_count (SURVEY.md §5 carry-over); the real
TPU is only used by bench.py. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# persistent compile cache: the suite is compile-dominated on CPU
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin registers itself at interpreter startup
# (sitecustomize) and ignores JAX_PLATFORMS env alone — force CPU through
# the config API too, before any jax.devices() call.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
