"""Test config: force a virtual 8-device CPU platform before JAX initializes.

This is the standard JAX fake-multi-host technique (SURVEY.md §4d): all tests,
including the data-parallel mesh tests, run against 8 virtual CPU devices so
multi-chip sharding is exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(scope="session")
def reference_path():
    """Path to the upstream PyTorch reference, used only to generate golden
    values in tests (never imported by the framework itself)."""
    if not reference_available():
        pytest.skip("reference snapshot not available")
    import sys

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    return REFERENCE_DIR
