"""Test harness: force the CPU backend with 8 virtual devices.

All tests run on CPU — the oracle's home — with an 8-device virtual
mesh so sharding logic is exercised without TPU hardware (the standard
JAX substitute for a fake distributed backend; SURVEY.md section 4).
NOTE: this environment's `axon` TPU plugin ignores JAX_PLATFORMS, so we
must use jax.config.update before any backend initialization.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture(scope="session")
def rtol():
    return 1e-5
