"""Golden tests: image-quality metrics vs the reference's numpy/scipy
implementations (utils/utils.py:95-333)."""

import numpy as np
import jax.numpy as jnp
import pytest

from retinex_tpu.ops import metrics as M


@pytest.fixture
def imgs(rng):
    a = rng.random((48, 64, 3)).astype(np.float32)
    b_ = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1).astype(np.float32)
    return a, b_


def test_psnr_parity(reference_path, imgs):
    from utils.utils import calculate_psnr

    a, b_ = imgs
    want = calculate_psnr(a, b_)
    got = float(M.psnr(jnp.asarray(a), jnp.asarray(b_)))
    assert abs(want - got) < 1e-3


def test_psnr_identical_images(imgs):
    a, _ = imgs
    assert float(M.psnr(jnp.asarray(a), jnp.asarray(a))) == 100.0


def test_ssim_parity(reference_path, imgs):
    from utils.utils import calculate_ssim

    a, b_ = imgs
    want = calculate_ssim(a, b_)
    got = float(M.ssim(jnp.asarray(a), jnp.asarray(b_)))
    assert abs(want - got) < 1e-3, (want, got)


def test_niqe_parity(reference_path, imgs):
    from utils.utils import calculate_niqe

    a, _ = imgs
    want = calculate_niqe(a.astype(np.float64))
    got = float(M.niqe_simplified(jnp.asarray(a)))
    assert abs(want - got) / max(abs(want), 1e-8) < 1e-3, (want, got)


def test_saturation_parity(reference_path, imgs):
    from utils.utils import calculate_saturation

    a, _ = imgs
    want = calculate_saturation(a)
    got = float(M.saturation(jnp.asarray(a)))
    assert abs(want - got) < 1e-5


def test_naturalness_parity(reference_path, imgs):
    from utils.utils import calculate_naturalness

    a, _ = imgs
    want = calculate_naturalness(a)
    got = float(M.naturalness(jnp.asarray(a)))
    assert abs(want - got) < 1e-4


def test_entropy_parity(imgs):
    a, _ = imgs
    hist, _ = np.histogram(a.flatten(), bins=256, range=(0, 1))
    p = hist / hist.sum()
    p = p[p > 0]
    want = -np.sum(p * np.log2(p))
    got = float(M.entropy(jnp.asarray(a)))
    assert abs(want - got) < 1e-3


def test_calculate_metrics_bundle(imgs):
    a, b_ = imgs
    m = M.calculate_metrics(jnp.asarray(a), jnp.asarray(b_))
    for key in ("mean_brightness", "contrast", "entropy", "niqe", "saturation",
                "naturalness", "psnr", "ssim", "mse"):
        assert key in m and np.isfinite(float(m[key])), key
