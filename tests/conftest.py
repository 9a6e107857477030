"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session
(SURVEY.md §4: multi-chip tests runnable on CPU via
``xla_force_host_platform_device_count``).

Note: in this environment the TPU is attached through the experimental 'axon'
PJRT plugin, which ignores the ``JAX_PLATFORMS`` environment variable — the
only reliable way to keep tests off the TPU is ``jax.config.update``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
