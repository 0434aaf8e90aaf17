"""Test harness config: run everything on CPU with 8 fake devices.

SURVEY.md §4.3: distributed (DP mesh / shard_map / psum) paths are exercised
without a cluster by forcing the host platform to expose 8 virtual devices.

Note: this environment's sitecustomize registers a TPU PJRT plugin and pins
``jax_platforms`` via jax.config (which overrides the JAX_PLATFORMS env var),
so we must both inject XLA_FLAGS before the CPU client initializes AND
override the config after importing jax.

Exception: ``CSR_TPU_TESTS=1`` leaves the real backend in place for the
TPU-only perf-regression guard (tests/test_perf.py):

    CSR_TPU_TESTS=1 python -m pytest tests/test_perf.py -m perf -q
"""

import os

if os.environ.get("CSR_TPU_TESTS") == "1":
    import jax  # noqa: F401  (real backend, usually TPU)
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

    assert len(jax.devices("cpu")) == 8, (
        "tests require 8 fake CPU devices; got " + repr(jax.devices()))
