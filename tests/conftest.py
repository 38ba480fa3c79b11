"""Test env: force an 8-virtual-device CPU platform before jax initializes.

This is the JAX equivalent of a fake distributed backend — multi-chip sharding
tests run on one host (SURVEY.md §4 test-strategy obligations).
"""

import os

# force, not setdefault: the TPU host env pins JAX_PLATFORMS=axon globally
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
