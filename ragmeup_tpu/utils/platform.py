"""Platform selection that actually works in plugin-forced environments.

Some deployments register a TPU PJRT plugin from sitecustomize and override
``jax_platforms`` at interpreter start, which silently defeats the standard
``JAX_PLATFORMS`` env var. ``ensure_platform`` re-applies the requested
platform through ``jax.config`` before any backend initializes. Call it at
the top of every entrypoint (server main, bench, eval scripts)."""

from __future__ import annotations

import os


def ensure_platform(platform: str | None = None) -> str:
    """Force the JAX platform. Resolution order: explicit arg →
    $RAGMEUP_PLATFORM → $JAX_PLATFORMS → leave as-is."""
    want = platform or os.environ.get("RAGMEUP_PLATFORM") \
        or os.environ.get("JAX_PLATFORMS")
    import jax
    if want:
        jax.config.update("jax_platforms", want)
    return jax.default_backend()
