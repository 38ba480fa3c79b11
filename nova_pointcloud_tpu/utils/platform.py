"""Platform selection guard for this TPU host.

The host's sitecustomize pins JAX_PLATFORMS=axon at interpreter start,
clobbering any value from the shell. When the caller clearly wants virtual
CPU devices (xla_force_host_platform_device_count in XLA_FLAGS), re-assert
the CPU platform before jax resolves its backends.
"""

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/nova_jax_cache")


def enable_compilation_cache(cache_dir: str = None):
    """Persistent XLA compilation cache (VERDICT r2 weak #4).

    The flagship serving program compiles for ~10 minutes through the axon
    relay on every fresh process; caching the serialized executable on disk
    makes the second process start in seconds. Thresholds are zeroed so even
    small programs (schedulers, checksums) cache — compile latency through
    the relay is high regardless of program size.

    Disable with NOVA_NO_COMPILE_CACHE=1 (e.g. when timing cold compiles).

    TPU-backend only: XLA:CPU executables embed AOT machine-feature sets and
    loading an entry whose features mismatch the host is undefined behavior
    (observed on this host: "+prefer-no-scatter ... could lead to SIGILL"
    loader errors followed by nondeterministic hangs/crashes of the tiny t2v
    app sampler under pytest). CPU compiles are seconds anyway — the cache
    exists to absorb the ~10-minute axon-relay TPU compiles.
    """
    if os.environ.get("NOVA_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.default_backend() == "cpu":
        return
    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                            _DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


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
