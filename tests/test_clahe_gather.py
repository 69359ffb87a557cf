"""Gather-based Pallas CLAHE pipeline (ops/clahe_gather.py) vs the XLA path.

Runs the kernels in interpreter mode on CPU; the real-hardware lowering is
exercised by scripts/perf_lab.py and the TPU benchmark. Tolerance budget:
the two paths may differ by +-1/255 on a ~1e-5 pixel fraction (FMA formation
at exact .5 blend ties; Mosaic pow(1/3) vs XLA cbrt) — see PARITY.md.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from retinex_tpu.ops.clahe import clahe_lab_rgb
from retinex_tpu.ops.clahe_gather import (
    clahe_lab_rgb_gather,
    clahe_rgb_u8_gather,
    gather_supported,
)

SHAPE = (1, 128, 1024, 3)  # hh=8, hw=64: small valid case


@pytest.fixture(scope="module")
def img():
    r = np.random.default_rng(7)
    return jnp.asarray(r.random(SHAPE, dtype=np.float32) * 0.7)


def test_gather_supported_predicate():
    assert gather_supported(1088, 1920, 8, 8)  # the 1080p bench shape
    assert gather_supported(128, 1024, 8, 8)
    assert not gather_supported(100, 1024, 8, 8)  # H not cell-divisible
    assert gather_supported(128, 192, 8, 8)  # hw=12: fits one vreg
    assert not gather_supported(4096, 4096, 1, 1)  # hw=2048 > one vreg


def test_matches_xla_path(img):
    want = np.asarray(clahe_lab_rgb(img, use_pallas=False))
    got = np.asarray(clahe_lab_rgb_gather(img, interpret=True))
    d = np.abs(want - got) * 255.0
    assert d.max() <= 2.0, f"max diff {d.max()} levels"
    assert (d > 0.5).mean() < 1e-3, f"mismatch fraction {(d > 0.5).mean()}"


def test_u8_and_f32_entry_points_agree(img):
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
    out_u8 = np.asarray(clahe_rgb_u8_gather(u8, interpret=True))
    out_f32 = np.asarray(clahe_lab_rgb_gather(img, interpret=True))
    np.testing.assert_allclose(out_u8.astype(np.float32) / 255.0, out_f32, atol=1e-7)
    assert out_u8.dtype == np.uint8
    assert out_u8.shape == SHAPE


def test_unsupported_shape_raises(img):
    with pytest.raises(ValueError):
        clahe_lab_rgb_gather(img[:, :100], interpret=True)


def test_clahe_lab_rgb_auto_falls_back_on_cpu(img):
    # On the CPU test platform, auto-routing must silently use the XLA path.
    out = clahe_lab_rgb(img)  # use_pallas=None (auto)
    want = clahe_lab_rgb(img, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_hwc_squeeze(img):
    single = img[0]
    out = np.asarray(clahe_lab_rgb_gather(single, interpret=True))
    batched = np.asarray(clahe_lab_rgb_gather(img, interpret=True))
    np.testing.assert_array_equal(out, batched[0])


def test_fast_cbrt_accuracy():
    # The TPU kernels (fastmath=True) use the Newton cbrt; its error must be
    # far below one 8-bit output level over the Lab/sRGB input ranges.
    from retinex_tpu.ops.clahe_gather import _fast_cbrt

    t = jnp.asarray(np.linspace(1e-12, 1.1, 200_001, dtype=np.float32)[1:])
    got = np.asarray(_fast_cbrt(t))
    ref = np.cbrt(np.asarray(t, np.float64))
    rel = np.abs(got - ref) / ref
    assert rel.max() < 5e-5, rel.max()
    # gamma route: x**(1/2.4) == cbrt(x) * sqrt(sqrt(cbrt(x)))
    x64 = np.asarray(t, np.float64)
    g = got * np.sqrt(np.sqrt(got))
    assert np.abs(g - x64 ** (1 / 2.4)).max() * 255 * 1.055 < 0.05
