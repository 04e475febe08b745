"""Test environment: 8 virtual CPU devices, pallas in interpret mode.

Mirrors the driver's multichip dry-run environment; all kernels are validated
on CPU with ``interpret=True`` and against pure-jnp oracles (the reference
repo had no test suite at all — see SURVEY.md §4 — so the oracle-vs-kernel
duality here replaces its ad-hoc torch-vs-CUDA cross-checks).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU tunnel environment force-registers its backend via sitecustomize
# and JAX_PLATFORMS=axon; the config update below reliably overrides it.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight e2e/grad-match tests (full suite tier; the "
        "quick tier `pytest -m 'not slow'` stays under ~3 min on CPU)")
