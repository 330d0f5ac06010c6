"""Test configuration: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers the axon TPU plugin and
forces jax_platforms at interpreter start, so the JAX_PLATFORMS env var alone
is not enough — we must update jax.config before any backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _module_isolation():
    """Bound per-process accumulation across the 360+-test suite.

    At full-suite scale the single pytest process accumulates hundreds of
    compiled XLA CPU executables plus parked serving worker threads (each
    pinning its engine's pools); past ~300 tests the NEXT compile could
    segfault inside backend_compile_and_load (reproduced twice, different
    tests — scale-dependent, never reproducible on a single file). Stop
    leaked BatchedChatBackend workers and drop compile caches at every
    module boundary so no single module inherits that pressure."""
    yield
    try:
        from ragmeup_tpu.pipeline.serving import BatchedChatBackend
        BatchedChatBackend.stop_all()
    except Exception:
        pass
    import gc
    jax.clear_caches()
    gc.collect()
