"""Test harness config: run everything on CPU with 8 fake devices.

SURVEY.md §4.3: distributed (DP mesh / shard_map / psum) paths are exercised
without a cluster by forcing the host platform to expose 8 virtual devices.
Must run before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
