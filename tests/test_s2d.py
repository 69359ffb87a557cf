"""Space-to-depth conv transforms: exactness vs direct convolution."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax import lax

from retinex_tpu.ops.s2d import (
    conv_s2d,
    d2s,
    maxpool3x3_s1_s2d,
    pack_kernel_s1,
    pack_kernel_s2,
    pack_pointwise,
    s2d,
)


def _conv(x, k, stride=1):
    return lax.conv_general_dilated(
        x, k, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 12, 5), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(d2s(s2d(x))), np.asarray(x))


@pytest.mark.parametrize("ksize", [3, 7])
def test_packed_s1_conv_exact(rng, ksize):
    x = jnp.asarray(rng.random((2, 16, 24, 6), dtype=np.float32))
    k = jnp.asarray(rng.normal(size=(ksize, ksize, 6, 4)), jnp.float32)
    want = _conv(x, k)
    got = d2s(conv_s2d(s2d(x), pack_kernel_s1(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_s2_conv_exact(rng):
    x = jnp.asarray(rng.random((2, 16, 24, 6), dtype=np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 8)), jnp.float32)
    # torch-parity stride-2 conv: explicit pad 1 (XLA 'SAME' at stride 2 pads
    # (0,1), which is NOT what the model/reference use).
    want = lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    # stride-2 packed conv outputs at packed resolution, already unpacked.
    got = conv_s2d(s2d(x), pack_kernel_s2(k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_pointwise_exact(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 6), dtype=np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 6, 3)), jnp.float32)
    want = _conv(x, k)
    got = d2s(conv_s2d(s2d(x), pack_pointwise(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_packed_conv_bias(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 2), dtype=np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 2, 5)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    want = _conv(x, k) + bias
    got = d2s(conv_s2d(s2d(x), pack_kernel_s1(k), bias=bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_maxpool_exact(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.random((2, 12, 16, 4), dtype=np.float32))
    want = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
    got = d2s(maxpool3x3_s1_s2d(s2d(x)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_s2d_upsample_mxu_matches_phase_form():
    from retinex_tpu.ops.s2d import s2d_upsample, s2d_upsample_mxu

    rng = np.random.default_rng(3)
    for factor, h, w in ((2, 8, 12), (4, 6, 10), (16, 4, 5)):
        g = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
        want = np.asarray(s2d_upsample(g, factor))
        got = np.asarray(s2d_upsample_mxu(g, factor))
        np.testing.assert_allclose(got, want, atol=1e-5)
