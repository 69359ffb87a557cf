"""Pallas implicit-GEMM conv (ops/conv_pallas.py) vs lax.conv, interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from retinex_tpu.ops.conv_pallas import conv2d_pallas, conv_pallas_supported


def _ref_conv(x, k, b, relu):
    kh, kw = k.shape[:2]
    pad = ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2))
    out = lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    return jnp.maximum(out, 0) if relu else out


@pytest.mark.parametrize("kh,kw,relu", [(3, 3, True), (2, 2, False), (3, 2, True)])
def test_matches_lax_conv(kh, kw, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 256, 128), np.float32))
    k = jnp.asarray(rng.standard_normal((kh, kw, 128, 128), np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((128,), np.float32))
    got = conv2d_pallas(x, k, b, relu=relu, interpret=True)
    want = _ref_conv(x, k, b, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_no_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 128, 128), np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 128, 128), np.float32) * 0.05)
    got = conv2d_pallas(x, k, interpret=True)
    want = _ref_conv(x, k, jnp.zeros((128,)), False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_supported_predicate():
    assert conv_pallas_supported((2, 544, 960, 128), (3, 3, 128, 128))
    assert conv_pallas_supported((2, 544, 960, 256), (2, 2, 256, 256))
    assert not conv_pallas_supported((2, 544, 960, 128), (1, 1, 128, 128))  # 1x1: XLA wins
    assert not conv_pallas_supported((2, 544, 960, 64), (3, 3, 64, 64))  # narrow
    assert not conv_pallas_supported((2, 544, 960, 128), (5, 5, 128, 128))  # big kernel
    assert not conv_pallas_supported((2, 4, 960, 128), (3, 3, 128, 128))  # tiny H


def _ref_conv_dil(x, k, b, relu, dilation):
    kh = k.shape[0]
    pad = (kh // 2) * dilation
    out = lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return jnp.maximum(out, 0) if relu else out


@pytest.mark.parametrize("cin,cout,dil,relu", [(32, 32, 1, True), (32, 64, 2, False), (64, 64, 1, False), (24, 32, 1, True)])
def test_narrow_matches_lax_conv(cin, cout, dil, relu):
    from retinex_tpu.ops.conv_pallas import conv2d_narrow

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 256, cin), np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout), np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((cout,), np.float32))
    got = conv2d_narrow(x, k, b, relu=relu, dilation=dil, interpret=True)
    want = _ref_conv_dil(x, k, b, relu, dil)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_narrow_supported_predicate():
    from retinex_tpu.ops.conv_pallas import conv_narrow_supported

    assert conv_narrow_supported((2, 1088, 1920, 32), (3, 3, 32, 32))
    assert conv_narrow_supported((2, 1088, 1920, 32), (3, 3, 32, 64), dilation=2)
    assert not conv_narrow_supported((2, 1088, 1920, 128), (3, 3, 128, 128))  # wide
    assert not conv_narrow_supported((2, 1088, 1920, 32), (3, 3, 32, 32), dilation=3)
    assert not conv_narrow_supported((2, 100, 100, 32), (3, 3, 32, 32))  # bad dims


@pytest.mark.parametrize("kh,relu", [(3, True), (2, False)])
def test_im2col_matches_lax_conv(kh, relu):
    from retinex_tpu.ops.conv_pallas import conv2d_pallas_im2col

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 256, 128), np.float32))
    k = jnp.asarray(rng.standard_normal((kh, kh, 128, 128), np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((128,), np.float32))
    got = conv2d_pallas_im2col(x, k, b, relu=relu, interpret=True)
    want = _ref_conv(x, k, b, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
