"""Augmentation distribution tests.

The reference draws every augmentation's apply-gate and magnitude from
independent RNG calls (reference: datasets/dataset.py:133-183). A round-1 bug
drew both from the same PRNG key, perfectly correlating them: when the gate
fired, contrast factors were confined to [0.8, 1.0) (never increasing),
brightness shifts were always negative, and saturation always desaturated.
These tests assert the *joint* gate/magnitude distribution covers the full
range, so any such correlation fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinex_tpu.data.augment import augment_batch, sample_advanced_params


def _applied(params, gate, mag):
    on = np.asarray(params[gate]).reshape(-1) > 0.5
    vals = np.asarray(params[mag]).reshape(-1)
    return vals[on]


@pytest.fixture(scope="module")
def params():
    return sample_advanced_params(jax.random.PRNGKey(0), 4096)


def test_applied_contrast_covers_full_range(params):
    vals = _applied(params, "c_on", "contrast")
    assert vals.size > 1000
    # Independent draws: applied factors must cover both halves of [0.8, 1.2].
    assert vals.max() > 1.15, "contrast never increases when applied (gate/factor correlated)"
    assert vals.min() < 0.85
    # Roughly half the applied factors should exceed 1.0.
    frac_above = (vals > 1.0).mean()
    assert 0.4 < frac_above < 0.6


def test_applied_brightness_covers_both_signs(params):
    vals = _applied(params, "br_on", "brightness")
    assert vals.max() > 0.08, "brightness shift never positive when applied"
    assert vals.min() < -0.08
    frac_pos = (vals > 0).mean()
    assert 0.4 < frac_pos < 0.6


def test_applied_saturation_covers_full_range(params):
    vals = _applied(params, "s_on", "saturation")
    assert vals.max() > 1.15, "saturation never increases when applied"
    assert vals.min() < 0.85


def test_applied_gamma_and_hue_cover_full_range(params):
    gamma = _applied(params, "g_on", "gamma")
    assert gamma.max() > 1.7 and gamma.min() < 0.7
    hue = _applied(params, "h_on", "hue")
    assert hue.max() > 0.04 and hue.min() < -0.04


def test_gates_fire_at_expected_rates(params):
    for gate, p in [("g_on", 0.5), ("c_on", 0.5), ("br_on", 0.5),
                    ("n_on", 0.7), ("s_on", 0.5), ("h_on", 0.5)]:
        rate = np.asarray(params[gate]).mean()
        assert abs(rate - p) < 0.05, f"{gate} fires at {rate}, expected ~{p}"


def test_augment_batch_uses_sampled_params():
    """End-to-end: with a mid-gray batch, contrast is a no-op and brightness
    shows up as a per-sample constant shift — check the shift distribution
    through the public API covers both signs."""
    key = jax.random.PRNGKey(7)
    b = 512
    batch = jnp.full((b, 4, 4, 3), 0.5, dtype=jnp.float32)
    out = augment_batch(key, batch, basic=False, advanced=True)
    assert out.shape == batch.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # Per-sample means should spread both above and below 0.5 (gamma on 0.5
    # moves down for gamma<1? no: 0.5**0.6 > 0.5 — either way both directions
    # must appear if magnitudes are drawn independently of gates).
    means = np.asarray(out.mean(axis=(1, 2, 3)))
    assert (means > 0.505).any() and (means < 0.495).any()


def test_basic_flips_preserve_content():
    key = jax.random.PRNGKey(3)
    batch = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3), dtype=np.float32))
    out = augment_batch(key, batch, basic=True, advanced=False)
    # Flips/rotations permute pixels: per-sample sorted values are unchanged.
    a = np.sort(np.asarray(batch).reshape(8, -1), axis=1)
    b = np.sort(np.asarray(out).reshape(8, -1), axis=1)
    np.testing.assert_allclose(a, b, atol=1e-6)
