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

# ---------------------------------------------------------------------------
# Test tiering: the full suite costs ~55 min on this 1-core host (202+ tests),
# so the per-commit gate is `pytest -m "not slow"` (<10 min) and the full
# suite runs per-round / when touching a slow subsystem. Modules here are the
# heavyweights: torch-parity harnesses (build a torch model AND the flax one,
# both on the single CPU core), subprocess-spawning distributed jobs, and the
# overfit/e2e integration drivers. Individual tests can also opt in with
# @pytest.mark.slow.
# ---------------------------------------------------------------------------
SLOW_MODULES = {
    "test_beit_torch_parity",
    "test_da2_torch_parity",
    "test_dpt_torch_parity",
    "test_flagship_torch_parity",
    "test_hybrid_torch_parity",
    "test_levit_torch_parity",
    "test_localbins_torch_parity",
    "test_midas_net_torch_parity",
    "test_swin_torch_parity",
    "test_train_parity",
    "test_torch_import_numeric",
    "test_torch_import_semantics",
    "test_torch_import_levit",
    "test_torch_import_backbones",
    "test_distributed",
    "test_overfit_integration",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (torch-parity harness, subprocess distributed "
        'job, integration driver); excluded from the per-commit `-m "not slow"` gate',
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1].removesuffix(".py")
        if module in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
