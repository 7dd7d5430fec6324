"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md section 4 point 4: the JAX analog of multi-node testing without a
cluster is `xla_force_host_platform_device_count`. Must be set before jax
initializes, hence here at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize registers the axon TPU plugin at interpreter
# start and hard-sets jax_platforms="axon,cpu", overriding the env var — so we
# must override the config again here, before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (multi-minute suites); tests "
        "marked heavy (tens of minutes: full parity matrices, kernel "
        "interpret sweeps) still need --runheavy",
    )
    parser.addoption(
        "--runheavy",
        action="store_true",
        default=False,
        help="also run tests marked heavy (implies --runslow; the FULL "
        "suite takes ~40 min single-process)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: expensive suite (multi-minute XLA compiles); excluded from "
        "the default run, enable with --runslow",
    )
    config.addinivalue_line(
        "markers",
        "heavy: tens-of-minutes suites (full parity matrices, kernel "
        "interpret sweeps); excluded even from --runslow, enable with "
        "--runheavy",
    )


def pytest_collection_modifyitems(config, items):
    run_heavy = config.getoption("--runheavy")
    run_slow = config.getoption("--runslow") or run_heavy
    skip_slow = pytest.mark.skip(
        reason="slow suite: pass --runslow for the full run"
    )
    skip_heavy = pytest.mark.skip(
        reason="heavy suite: pass --runheavy to include it"
    )
    for item in items:
        if "heavy" in item.keywords:
            if not run_heavy:
                item.add_marker(skip_heavy)
        elif "slow" in item.keywords and not run_slow:
            item.add_marker(skip_slow)


@pytest.fixture
def rng():
    return np.random.default_rng(seed=42)
