"""Platform selection that actually works in plugin-forced environments.

Some deployments register a TPU PJRT plugin from sitecustomize and override
``jax_platforms`` at interpreter start, which silently defeats the standard
``JAX_PLATFORMS`` env var. ``ensure_platform`` re-applies the requested
platform through ``jax.config`` before any backend initializes. Call it at
the top of every entrypoint (server main, bench, eval scripts)."""

from __future__ import annotations

import os


def ensure_platform(platform: str | None = None,
                    compilation_cache: bool = True) -> str:
    """Force the JAX platform. Resolution order: explicit arg →
    $RAGMEUP_PLATFORM → $JAX_PLATFORMS → leave as-is.

    Also enables the persistent compilation cache by default — remote/AOT
    TPU compiles in tunneled environments are slow (up to minutes) and
    highly variable; the cache makes warm starts instant."""
    want = platform or os.environ.get("RAGMEUP_PLATFORM") \
        or os.environ.get("JAX_PLATFORMS")
    import jax
    if want:
        jax.config.update("jax_platforms", want)
    if compilation_cache:
        cache_dir = os.environ.get(
            "RAGMEUP_JAX_CACHE",
            os.path.expanduser("~/.cache/ragmeup_jax_cache"))
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    return jax.default_backend()
