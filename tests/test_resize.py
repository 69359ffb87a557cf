"""resize_bilinear's exact-integer-downscale fast path vs jax.image.resize."""

import jax
import jax.numpy as jnp
import numpy as np

from retinex_tpu.ops.resize import resize_bilinear, resize_scale


def test_exact_integer_downscale_matches_jax_image():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((2, 24, 36, 3), dtype=np.float32))
    for ry, rx in ((2, 2), (4, 4), (3, 3), (2, 4), (1, 2), (3, 2)):
        oh, ow = 24 // ry, 36 // rx
        got = resize_bilinear(x, oh, ow)
        want = jax.image.resize(x, (2, oh, ow, 3), method="linear", antialias=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_non_integer_ratio_still_uses_general_path():
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.random((1, 20, 30, 3), dtype=np.float32))
    got = resize_bilinear(x, 13, 17)
    want = jax.image.resize(x, (1, 13, 17, 3), method="linear", antialias=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_resize_scale_half_quarter():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
    for s in (0.5, 0.25):
        got = resize_scale(x, s)
        want = jax.image.resize(
            x, (1, int(64 * s), int(96 * s), 3), method="linear", antialias=False
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
