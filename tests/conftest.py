"""Test harness config: run everything on CPU with 8 fake devices.

SURVEY.md §4.3: distributed (DP mesh / shard_map / psum) paths are exercised
without a cluster by forcing the host platform to expose 8 virtual devices.

Note: this environment's sitecustomize registers a TPU PJRT plugin and pins
``jax_platforms`` via jax.config (which overrides the JAX_PLATFORMS env var),
so we must both inject XLA_FLAGS before the CPU client initializes AND
override the config after importing jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices("cpu")) == 8, (
    "tests require 8 fake CPU devices; got " + repr(jax.devices()))
