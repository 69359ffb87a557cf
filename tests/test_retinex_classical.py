"""Tests for the classical SSR/MSR path: blur approximation quality, log-domain
identities, and end-to-end enhancement behavior on a real low-light photo."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from retinex_tpu.ops import retinex_classical as rc
from retinex_tpu.ops.filters import gaussian_blur


def test_box_blur_axis_matches_numpy_mean(rng):
    x = rng.random((1, 16, 20, 1)).astype(np.float32)
    r = 2
    got = np.asarray(rc._box_blur_axis(jnp.asarray(x), r, axis=1))
    padded = np.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    want = np.stack([padded[:, i : i + 2 * r + 1].mean(axis=1) for i in range(16)], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gauss_approx_close_to_true_gaussian(rng):
    x = rng.random((1, 64, 64, 1)).astype(np.float32)
    sigma = 5.0
    approx = np.asarray(rc.gaussian_blur_approx(jnp.asarray(x), sigma))
    k = 2 * int(3 * sigma) + 1
    exact = np.asarray(gaussian_blur(jnp.asarray(x), k, sigma))
    # 3-box approximation: low-frequency content matches well; compare away
    # from borders where padding conventions differ.
    d = np.abs(approx - exact)[0, 16:-16, 16:-16, 0]
    assert d.max() < 0.05, d.max()
    assert d.mean() < 0.01


def test_ssr_log_identity():
    # On a constant image the blur equals the image, so SSR must be ~0.
    x = jnp.full((1, 40, 40, 3), 0.3, jnp.float32)
    out = np.asarray(rc.single_scale_retinex(x, 15.0))
    assert np.abs(out).max() < 1e-5


def test_msr_weights_sum():
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)), jnp.float32)
    m = np.asarray(rc.multi_scale_retinex(x, sigmas=(5.0,), weights=(1.0,)))
    s = np.asarray(rc.single_scale_retinex(x, 5.0))
    np.testing.assert_allclose(m, s, atol=1e-6)


def test_percentile_stretch_range(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    out = np.asarray(rc.percentile_stretch(x, 0.01))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # ~1% of each tail is clipped.
    assert (out == 0.0).mean() > 0.001
    assert (out == 1.0).mean() > 0.001


def test_msr_enhance_brightens_low_light():
    img = np.asarray(
        Image.open("/root/reference/data/input/102708607-003694-003694.jpg").convert("RGB")
    )[:256, :256].astype(np.float32) / 255.0
    out = np.asarray(rc.msr_enhance(jnp.asarray(img)))
    assert out.shape == img.shape
    assert out.mean() > img.mean()  # low-light input must get brighter
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_msrcr_enhance_runs():
    img = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(rc.msr_enhance(jnp.asarray(img), mode="msrcr"))
    assert out.shape == img.shape
    assert np.isfinite(out).all()
