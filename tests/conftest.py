"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (the TPU-world
substitute for multi-chip hardware); numerics tests run in float64 on CPU.
Must set flags before jax initializes a backend.
"""

import os

# The environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must run on CPU
# with 8 virtual devices. XLA_FLAGS must be set before backend init, and the
# platform override must go through jax.config (env var is pre-empted).
existing = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in existing:
    os.environ["XLA_FLAGS"] = (existing + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute distributed/MG/e2e tests; excluded from the "
        "fast lane (`pytest -m 'not slow'`, < 5 minutes) — run the full "
        "suite before landing solver or parallel changes")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
