"""Platform selection guard for this TPU host.

The host's sitecustomize pins JAX_PLATFORMS=axon at interpreter start,
clobbering any value from the shell. When the caller clearly wants virtual
CPU devices (xla_force_host_platform_device_count in XLA_FLAGS), re-assert
the CPU platform before jax resolves its backends.
"""

import os


def ensure_cpu_if_forced():
    forced = (
        "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
        # NOVA_PLATFORM survives the sitecustomize clobber of JAX_PLATFORMS
        or os.environ.get("NOVA_PLATFORM", "").lower() == "cpu")
    if not forced:
        return
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
