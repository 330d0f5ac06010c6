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
