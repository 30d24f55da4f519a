"""JAX runtime configuration helpers (platform + compilation cache)."""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None):
    """Turn on JAX's persistent compilation cache.

    AMG hierarchies re-compile per problem-shape; the cache makes repeated
    test/benchmark runs start hot.
    """
    import jax

    path = path or os.environ.get(
        "NGSAMG_CACHE_DIR", os.path.expanduser("~/.cache/ngsamg_tpu_jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def force_cpu(n_devices: int = 8):
    """Select the CPU backend with n virtual devices (tests / multichip dryrun).

    Must run before the first JAX backend use. Overrides the sitecustomize
    platform forcing of remote-TPU environments.
    """
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={n_devices}",
    )
    if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += (
            f" --xla_force_host_platform_device_count={n_devices}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
