"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh; real-TPU behavior is covered by bench/driver)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.device_count()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
