"""Golden tests: CLAHE vs OpenCV (exact on the L channel; tight tolerance on
the full Lab pipeline where cv2's fixed-point colorspace LUTs differ ±1)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from retinex_tpu.ops.clahe import clahe_lab_rgb, clahe_u8


@pytest.mark.parametrize("shape", [(64, 64), (100, 130), (57, 41)])
def test_clahe_u8_exact_vs_cv2(rng, shape):
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    want = clahe.apply(img).astype(np.int32)
    got = np.asarray(clahe_u8(jnp.asarray(img)))
    diff = np.abs(want - got)
    # cv2 uses fixed-point interpolation weights; allow ±1 on a tiny fraction.
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.02, f"mismatch ratio {(diff > 0).mean()}"


def test_clahe_u8_batch(rng):
    imgs = rng.integers(0, 256, size=(3, 48, 80), dtype=np.uint8)
    got = np.asarray(clahe_u8(jnp.asarray(imgs)))
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    for i in range(3):
        want = clahe.apply(imgs[i]).astype(np.int32)
        assert np.abs(want - got[i]).max() <= 1


def test_clahe_u8_flat_image_identityish(rng):
    # A constant image must map to (nearly) the same constant: histogram is one
    # spike, clipping redistributes, CDF ramps — matches cv2 exactly.
    img = np.full((64, 64), 117, dtype=np.uint8)
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    want = clahe.apply(img).astype(np.int32)
    got = np.asarray(clahe_u8(jnp.asarray(img)))
    np.testing.assert_array_equal(got, want)


def _cv2_lab_clahe_chain(img_rgb_u8):
    """The reference's exact OpenCV chain (enhancers/adaptive_params.py:121-169)."""
    bgr = cv2.cvtColor(img_rgb_u8, cv2.COLOR_RGB2BGR)
    lab = cv2.cvtColor(bgr, cv2.COLOR_BGR2LAB)
    l, a, b = cv2.split(lab)
    l2 = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(l)
    out_bgr = cv2.cvtColor(cv2.merge((l2, a, b)), cv2.COLOR_LAB2BGR)
    return cv2.cvtColor(out_bgr, cv2.COLOR_BGR2RGB).astype(np.float32)


def test_clahe_lab_pipeline_vs_cv2_real_image():
    """Full fused pipeline vs cv2 on a real low-light photo. cv2's fixed-point
    Lab LUTs introduce ±1 in L, which CLAHE's monotone tile LUTs keep small."""
    from PIL import Image

    img = np.asarray(
        Image.open("/root/reference/data/input/094216845-003241-003241.jpg").convert("RGB")
    )[:512, :512]
    want = _cv2_lab_clahe_chain(img)
    got = np.asarray(clahe_lab_rgb(jnp.asarray(img, jnp.float32) / 255.0)) * 255.0
    diff = np.abs(want - got)
    assert np.percentile(diff, 99) <= 5.0, f"p99 diff {np.percentile(diff, 99)}"
    assert diff.mean() < 1.5, f"mean diff {diff.mean()}"


def test_clahe_lab_pipeline_vs_cv2_noise(rng):
    """Random noise is the worst case for LUT-quantization amplification; the
    agreement is statistical rather than per-pixel."""
    img = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    want = _cv2_lab_clahe_chain(img)
    got = np.asarray(clahe_lab_rgb(jnp.asarray(img, jnp.float32) / 255.0)) * 255.0
    diff = np.abs(want - got)
    assert np.percentile(diff, 99) <= 16.0, f"p99 diff {np.percentile(diff, 99)}"
    assert diff.mean() < 3.0, f"mean diff {diff.mean()}"
