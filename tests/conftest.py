"""Test config: force a virtual 8-device CPU platform before JAX initializes.

This is the standard JAX fake-multi-host technique (SURVEY.md §4d): all tests,
including the data-parallel mesh tests, run against 8 virtual CPU devices so
multi-chip sharding is exercised without TPU hardware.
"""

import os

# XLA flags must be set before the backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's 'axon' TPU plugin re-asserts JAX_PLATFORMS at jax import
# time, so the env var alone is not enough — override via jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
    import types

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)

    # The reference's losses/loss.py imports torchvision at module top purely
    # for the (network-downloading) VGG19; torchvision isn't installed here, so
    # stub it — tests that need perceptual features build their own torch VGG.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _no_vgg(*args, **kwargs):
            raise RuntimeError("torchvision.models.vgg19 stub: not available in tests")

        tv_models.vgg19 = _no_vgg
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    return REFERENCE_DIR
