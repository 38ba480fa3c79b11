"""Test env: force an 8-virtual-device CPU platform.

This is the JAX equivalent of a fake distributed backend — multi-chip sharding
tests run on one host (SURVEY.md §4 test-strategy obligations).

The TPU host's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon pinned, so env edits here are too late; we must go through
jax.config (which works any time before first backend resolution).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: repeated suite runs skip recompiling the
# heavy sharded/scan programs (utils/platform.enable_compilation_cache).
from nova_pointcloud_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_collection_modifyitems(config, items):
    """Default tier = everything not marked `full` (pyproject markers).

    Implemented here instead of `addopts='-m "not full"'` so that explicitly
    naming a full-marked file (`pytest tests/test_full_sampler_parity.py`)
    still runs it — with addopts that invocation silently deselected every
    test. Deselect only when the user gave no -m AND the selection mixes
    tiers (i.e. a broad `pytest tests/` run)."""
    if config.getoption("-m"):
        return
    full = [i for i in items if i.get_closest_marker("full") is not None]
    if not full or len(full) == len(items):
        return
    items[:] = [i for i in items if i.get_closest_marker("full") is None]
    config.hook.pytest_deselected(items=full)
