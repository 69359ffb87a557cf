"""Pallas fused CLAHE pipeline: interpret-mode parity with the XLA path."""

import numpy as np
import jax.numpy as jnp
import pytest

from retinex_tpu.ops.clahe import clahe_lab_rgb
from retinex_tpu.ops.clahe_pallas import clahe_lab_rgb_pallas


def test_pallas_pipeline_matches_xla(rng):
    x = jnp.asarray(rng.random((2, 96, 128, 3), dtype=np.float32))
    want = np.asarray(clahe_lab_rgb(x))
    got = np.asarray(clahe_lab_rgb_pallas(x, interpret=True))
    d = np.abs(want - got) * 255.0
    # Identical algorithm; differences only from in-kernel float .5-tie
    # rounding of blend weights / pow-vs-cbrt ulps.
    assert d.max() <= 2.0, d.max()
    assert (d > 0.5).mean() < 0.001


def test_pallas_rejects_non_divisible():
    x = jnp.zeros((1, 57, 41, 3), jnp.float32)
    with pytest.raises(ValueError):
        clahe_lab_rgb_pallas(x, interpret=True)
