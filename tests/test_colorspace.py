"""Golden tests: colorspace ops vs OpenCV."""

import cv2
import numpy as np
import jax.numpy as jnp

from retinex_tpu.ops import colorspace as cs


def _rand_img(rng, h=64, w=48):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_rgb_to_lab_u8_matches_cv2(rng):
    img = _rand_img(rng)
    lab_cv = cv2.cvtColor(img, cv2.COLOR_RGB2LAB).astype(np.int32)
    lab_jx = np.asarray(cs.rgb_to_lab_u8(jnp.asarray(img, jnp.float32) / 255.0))
    lab_jx = np.clip(np.round(lab_jx), 0, 255).astype(np.int32)
    diff = np.abs(lab_cv - lab_jx)
    # cv2 uses fixed-point LUTs; allow ±2 max, small mean error.
    assert diff.max() <= 2, f"max Lab diff {diff.max()}"
    assert diff.mean() < 0.2


def test_lab_roundtrip_close(rng):
    img = _rand_img(rng)
    x = jnp.asarray(img, jnp.float32) / 255.0
    back = cs.lab_u8_to_rgb(cs.rgb_to_lab_u8(x))
    diff = np.abs(np.asarray(back) * 255.0 - img.astype(np.float32))
    assert diff.max() <= 2.0, f"roundtrip max diff {diff.max()}"


def test_lab_to_rgb_matches_cv2(rng):
    img = _rand_img(rng)
    lab_cv = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    rgb_cv = cv2.cvtColor(lab_cv, cv2.COLOR_LAB2RGB).astype(np.int32)
    rgb_jx = np.asarray(cs.lab_u8_to_rgb(jnp.asarray(lab_cv, jnp.float32)))
    rgb_jx = np.clip(np.round(rgb_jx * 255.0), 0, 255).astype(np.int32)
    diff = np.abs(rgb_cv - rgb_jx)
    assert diff.max() <= 2, f"max RGB diff {diff.max()}"


def test_luma_and_mean_gray(rng):
    img = _rand_img(rng).astype(np.float32) / 255.0
    x = jnp.asarray(img)
    luma = np.asarray(cs.rgb_to_luma(x))
    expected = 0.299 * img[..., :1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:3]
    np.testing.assert_allclose(luma, expected, atol=1e-5)
    mean = np.asarray(cs.rgb_to_gray_mean(x))
    np.testing.assert_allclose(mean, img.mean(axis=-1, keepdims=True), atol=1e-6)


def test_saturation_map(rng):
    img = _rand_img(rng).astype(np.float32) / 255.0
    sat = np.asarray(cs.saturation_map(jnp.asarray(img)))
    mx, mn = img.max(-1), img.min(-1)
    expected = np.where(mx > 1e-8, (mx - mn) / np.maximum(mx, 1e-8), 0.0)
    np.testing.assert_allclose(sat, expected, atol=1e-6)
