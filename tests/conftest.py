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
