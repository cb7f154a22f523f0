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

# NO persistent compile cache for the CPU suite: XLA:CPU AOT cache entries
# record host machine features that the loader sometimes rejects/mis-matches
# ("prefer-no-scatter ... could lead to execution errors such as SIGILL"),
# causing intermittent hard aborts when cached executables are reloaded.
# TPU benches keep their own cache (bench.py) where this does not apply.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

# The axon TPU plugin registers itself at interpreter startup
# (sitecustomize) and ignores JAX_PLATFORMS env alone — force CPU through
# the config API too, before any jax.devices() call.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
