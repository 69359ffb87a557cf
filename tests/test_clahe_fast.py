"""clahe_u8_fast: bit-compatibility with the gather-based reference path and
with OpenCV, fallback behavior, and data/augment sanity."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from retinex_tpu.ops.clahe import clahe_u8
from retinex_tpu.ops.clahe_fast import clahe_u8_fast


def test_matches_reference_path_on_divisible_shapes(rng):
    img = rng.integers(0, 256, (2, 96, 128), np.uint8)
    a = np.asarray(clahe_u8(jnp.asarray(img)))
    b = np.asarray(clahe_u8_fast(jnp.asarray(img)))
    d = np.abs(a - b)
    # Float .5-tie rounding can differ on a tiny fraction of pixels.
    assert d.max() <= 1
    assert (d > 0).mean() < 0.005


def test_matches_cv2_at_1080p(rng):
    img = rng.integers(0, 256, (1088, 1920), np.uint8)
    want = cv2.createCLAHE(2.0, (8, 8)).apply(img).astype(np.int64)
    got = np.asarray(clahe_u8_fast(jnp.asarray(img)))
    d = np.abs(want - got)
    assert d.max() <= 1
    assert (d > 0).mean() < 0.005


def test_fallback_on_odd_shapes(rng):
    img = rng.integers(0, 256, (57, 41), np.uint8)
    a = np.asarray(clahe_u8(jnp.asarray(img)))
    b = np.asarray(clahe_u8_fast(jnp.asarray(img)))
    np.testing.assert_array_equal(a, b)  # identical code path


def test_augment_batch_shapes_and_determinism(rng):
    from retinex_tpu.data.augment import augment_batch

    batch = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    key = jax.random.PRNGKey(0)
    a = augment_batch(key, batch, basic=True, advanced=True)
    b = augment_batch(key, batch, basic=True, advanced=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same key -> same augs
    c = augment_batch(jax.random.PRNGKey(1), batch, basic=True, advanced=True)
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0


def test_augment_nonsquare_skips_rot90(rng):
    from retinex_tpu.data.augment import augment_batch

    batch = jnp.asarray(rng.random((2, 32, 48, 3), dtype=np.float32))
    out = augment_batch(jax.random.PRNGKey(0), batch, basic=True, advanced=False)
    assert out.shape == batch.shape
