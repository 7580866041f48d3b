"""Test fixtures: force an 8-device virtual CPU mesh (SURVEY §4: fake
multi-host testing via XLA host-platform device count)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env presets a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU ('axon') backend and resets
# jax_platforms at import time; override it after import so tests always run
# on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
