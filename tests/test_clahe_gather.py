"""Gather-based Pallas CLAHE pipeline (ops/clahe_gather.py) vs the XLA path.

Runs the kernels in interpreter mode on CPU; the real-hardware lowering is
exercised by scripts/perf_lab.py and the TPU benchmark. Tolerance budget:
the two paths may differ by +-1/255 on a ~1e-5 pixel fraction (FMA formation
at exact .5 blend ties; Mosaic pow(1/3) vs XLA cbrt) — see PARITY.md.
"""

import jax
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


@pytest.mark.parametrize("s", [2, 4])
def test_hist_subsample_matches_xla_path(img, s):
    """The Lab pipeline's decimated-histogram knob keeps gather/XLA agreement:
    both paths build tile histograms from the same within-cell s x s
    decimation (clahe_fast.py:115 vs clahe_gather.py l_cells slice), so the
    parity budget is the same as at s=1. Also asserts s>1 actually changes
    the output (the knob reaches the tables stage, not a dead kwarg)."""
    want = np.asarray(clahe_lab_rgb(img, use_pallas=False, hist_subsample=s))
    got = np.asarray(clahe_lab_rgb_gather(img, interpret=True, hist_subsample=s))
    d = np.abs(want - got) * 255.0
    assert d.max() <= 2.0, f"max diff {d.max()} levels"
    assert (d > 0.5).mean() < 1e-3, f"mismatch fraction {(d > 0.5).mean()}"
    exact = np.asarray(clahe_lab_rgb_gather(img, interpret=True))
    assert np.abs(got - exact).max() > 0, "s>1 must alter the histograms"


def test_u8_and_f32_entry_points_agree(img):
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
    out_u8 = np.asarray(clahe_rgb_u8_gather(u8, interpret=True))
    out_f32 = np.asarray(clahe_lab_rgb_gather(img, interpret=True))
    np.testing.assert_allclose(out_u8.astype(np.float32) / 255.0, out_f32, atol=1e-7)
    assert out_u8.dtype == np.uint8
    assert out_u8.shape == SHAPE


def test_pick_bands_vmem_budget():
    """Band count scales down with the per-band block so big frames stay
    inside the v5e 16 MB scoped VMEM: 4K tiles=16 (rows=68*32) at the
    1080p-tuned nb=4 OOM'd the AOT compiler (19.03M vs 16M, measured)."""
    from retinex_tpu.ops.clahe_gather import _pick_bands

    assert _pick_bands(16, 68 * 16 * 120) == 4  # 1080p tiles=8: proven point
    assert _pick_bands(32, 68 * 32 * 120) == 2  # 4K tiles=16: halve the bands
    assert _pick_bands(32, 4 * 68 * 16 * 120) == 1  # giant band: no unrolling
    assert _pick_bands(2, 68 * 16 * 120) == 2  # ncy divisibility still binds


def test_band_counts_are_value_invariant(img, monkeypatch):
    """nb=2 / nb=1 band blocking (what big frames now pick under the VMEM
    budget) must produce byte-identical output to the tuned nb=4 path — the
    band count is a layout knob, not a math one. Forced via the budget
    constant; jit caches cleared so each trace re-reads it."""
    import retinex_tpu.ops.clahe_gather as cg
    import retinex_tpu.ops.clahe_luma as cl

    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
    xp = jnp.transpose(u8, (0, 3, 1, 2))
    band = (SHAPE[1] // 16) * 16 * (SHAPE[2] // 16)  # hh * ncx * hw

    def run_all():
        cg.clahe_rgb_u8_planar_gather5.clear_cache()
        cg.clahe_rgb_u8_planar_gather6.clear_cache()
        cl.clahe_luma_rgb_u8_planar.clear_cache()
        return (
            np.asarray(cg.clahe_rgb_u8_planar_gather5(xp, interpret=True)),
            np.asarray(cg.clahe_rgb_u8_planar_gather6(xp, interpret=True)),
            np.asarray(cl.clahe_luma_rgb_u8_planar(xp, interpret=True)),
        )

    assert cg._pick_bands(16, band) == 4
    base = run_all()
    for budget, want_nb in ((2 * band, 2), (band, 1)):
        monkeypatch.setattr(cg, "_VMEM_BAND_BUDGET", budget)
        assert cg._pick_bands(16, band) == want_nb
        got = run_all()
        for b, g in zip(base, got):
            np.testing.assert_array_equal(b, g)
    monkeypatch.undo()
    run_all()  # leave the caches retraced at the real budget


def test_planar5_matches_planar6(img):
    # The 5D row-merged core is the production planar entry (round 3); it
    # must be bit-identical to the 6D cell-blocked core it replaced.
    from retinex_tpu.ops.clahe_gather import (
        clahe_rgb_u8_planar_gather,
        clahe_rgb_u8_planar_gather5,
        clahe_rgb_u8_planar_gather6,
    )

    u8p = (
        jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8).transpose(0, 3, 1, 2)
    )
    out5 = np.asarray(clahe_rgb_u8_planar_gather5(u8p, interpret=True))
    out6 = np.asarray(clahe_rgb_u8_planar_gather6(u8p, interpret=True))
    np.testing.assert_array_equal(out5, out6)
    assert clahe_rgb_u8_planar_gather is clahe_rgb_u8_planar_gather5


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
    # 3 Newton steps (round 3): ~1e-9 rel in exact arithmetic; the f32
    # evaluation floor (~1 ulp) dominates. The tight bound guards the
    # forward Lab math's tie-free-ness (PARITY #19, perf_lab cbrt3).
    assert rel.max() < 5e-7, rel.max()
    # gamma route: x**(1/2.4) == cbrt(x) * sqrt(sqrt(cbrt(x)))
    x64 = np.asarray(t, np.float64)
    g = got * np.sqrt(np.sqrt(got))
    assert np.abs(g - x64 ** (1 / 2.4)).max() * 255 * 1.055 < 0.05


def test_degamma_poly_u8_exhaustive():
    """The fast-math polynomial de-gamma (round 3: replaces the in-kernel
    table gathers) must track the exact sRGB curve to <3e-7 on all 256 u8
    grid points, and the resulting u8 Lab outputs may differ from the exact
    path on at most ~1e-5 of the full 256^3 input space, by at most +-1."""
    from retinex_tpu.ops.clahe_gather import _degamma_poly
    from retinex_tpu.ops.colorspace import srgb_to_linear

    k = np.arange(256, dtype=np.float32)
    poly = np.asarray(_degamma_poly(jnp.asarray(k)), np.float32)
    exact = np.asarray(srgb_to_linear(jnp.asarray(k / 255.0)), np.float32)
    assert np.abs(poly - exact).max() < 3e-7

    # Full 256^3 enumeration of quantized Lab outputs (numpy mirror of the
    # kernel math), chunked over the red axis.
    M = np.array(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        np.float32,
    )
    XN, ZN = np.float32(0.950456), np.float32(1.088754)

    def lab_q(linr, ling, linb):
        X = (M[0, 0] * linr + M[0, 1] * ling + M[0, 2] * linb) / XN
        Y = M[1, 0] * linr + M[1, 1] * ling + M[1, 2] * linb
        Z = (M[2, 0] * linr + M[2, 1] * ling + M[2, 2] * linb) / ZN

        def lab_f(t):
            return np.where(
                t > 0.008856,
                np.cbrt(np.maximum(t, 1e-12)),
                np.float32(7.787) * t + np.float32(16.0 / 116.0),
            )

        fx, fy, fz = lab_f(X), lab_f(Y), lab_f(Z)
        L8 = (116 * fy - 16) * np.float32(255.0 / 100.0)
        a8 = 500 * (fx - fy) + 128
        b8 = 200 * (fy - fz) + 128
        q = lambda v: np.clip(np.round(v), 0, 255).astype(np.int16)  # noqa: E731
        return q(L8), q(a8), q(b8)

    flips = 0
    for r0 in range(0, 256, 64):
        sl = slice(r0, r0 + 64)
        e = lab_q(exact[sl][:, None, None], exact[None, :, None], exact[None, None, :])
        p = lab_q(poly[sl][:, None, None], poly[None, :, None], poly[None, None, :])
        for a, b in zip(e, p):
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.max() <= 1
            flips += int((d > 0).sum())
    assert flips < 1000, flips  # measured 478 / 50.3M


def test_gamma_poly_accuracy():
    """fastmath _linear_to_srgb (round-3 poly) vs the exact curve: under
    0.01 u8 levels everywhere in the nonlinear region."""
    from retinex_tpu.ops.clahe_gather import _linear_to_srgb

    y = np.linspace(1e-7, 1.0, 200_001).astype(np.float32)
    got = np.asarray(_linear_to_srgb(jnp.asarray(y), fastmath=True), np.float64)
    y64 = y.astype(np.float64)
    want = np.where(y64 <= 0.0031308, y64 * 12.92, 1.055 * y64 ** (1 / 2.4) - 0.055)
    assert np.abs(got - want).max() * 255 < 0.01


def test_gamma255_poly_accuracy():
    """_linear_to_srgb255_fast (affine + *255 folded into the poly) vs the
    exact curve: under 0.01 u8 levels in the nonlinear region."""
    from retinex_tpu.ops.clahe_gather import _linear_to_srgb255_fast

    y = np.linspace(1e-7, 1.0, 200_001).astype(np.float32)
    got = np.asarray(_linear_to_srgb255_fast(jnp.asarray(y)), np.float64)
    y64 = y.astype(np.float64)
    want = 255.0 * np.where(
        y64 <= 0.0031308, y64 * 12.92, 1.055 * y64 ** (1 / 2.4) - 0.055
    )
    assert np.abs(got - want).max() < 0.01


def test_newton_gamma_accuracy():
    """The sqrt-free Newton 12th-root gamma (round 3, default fast-math path)
    vs the exact curve: under 0.001 u8 levels in the nonlinear region."""
    from retinex_tpu.ops.clahe_gather import _linear_to_srgb255_fast

    y = np.linspace(1e-7, 1.1, 400_001).astype(np.float32)
    got = np.asarray(_linear_to_srgb255_fast(jnp.asarray(y), newton=True), np.float64)
    y64 = y.astype(np.float64)
    want = 255.0 * np.where(
        y64 <= 0.0031308, y64 * 12.92, 1.055 * y64 ** (1 / 2.4) - 0.055
    )
    assert np.abs(got - want).max() < 0.001


def test_tables_kernel_bit_identity(monkeypatch):
    """The fused Pallas tables kernel (_TABLES_KERNEL=True: clip/redistribute/
    CDF/round/neighbour-select/byte-pack in one program) is bit-identical to
    the XLA op chain — on random, flat (max redistribute excess), and
    few-bin images, through the exact pipeline AND the luma mode at s=1/4."""
    import retinex_tpu.ops.clahe_gather as cg
    from retinex_tpu.ops.clahe_luma import clahe_luma_rgb_u8_planar

    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 256, (2, 3, 128, 1024), dtype=np.uint8),
        np.full((1, 3, 128, 1024), 37, dtype=np.uint8),
        (rng.integers(0, 3, (1, 3, 128, 1024)) * 127).astype(np.uint8),
    ]

    def run(x, kernel):
        monkeypatch.setattr(cg, "_TABLES_KERNEL", kernel)
        cg.clahe_rgb_u8_planar_gather5.clear_cache()
        clahe_luma_rgb_u8_planar.clear_cache()
        return (
            np.asarray(cg.clahe_rgb_u8_planar_gather5(x, interpret=True)),
            np.asarray(clahe_luma_rgb_u8_planar(x, interpret=True)),
            np.asarray(
                clahe_luma_rgb_u8_planar(x, interpret=True, hist_subsample=4)
            ),
        )

    for case in cases:
        x = jnp.asarray(case)
        for a, b in zip(run(x, False), run(x, True)):
            np.testing.assert_array_equal(a, b)


def test_tables_kernel_divmath_exhaustive():
    """The kernel evaluates OpenCV's two data-dependent integer divisions
    (256 // residual, bins // step) in f32; exact for every residual in
    [0, 256) — the full domain (residual = excess % 256)."""
    bins = np.arange(256)
    for residual in range(256):
        step = max(256 // max(residual, 1), 1)
        want = (bins % step == 0) & (bins // step < residual)
        step_f = max(
            np.floor(np.float32(256.0) / np.float32(max(residual, 1))),
            np.float32(1.0),
        )
        q = np.floor(bins.astype(np.float32) / step_f)
        got = (bins.astype(np.float32) - q * step_f == 0.0) & (
            q < np.float32(residual)
        )
        np.testing.assert_array_equal(want, got, err_msg=f"residual={residual}")


def test_tables_kernel_tiles16(monkeypatch):
    """The fused tables kernel at tiles=16 (the 4K configuration: n_tiles=256,
    n_cells=1024) matches the XLA chain bit-for-bit on a small t16 shape."""
    import retinex_tpu.ops.clahe_gather as cg

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 256, (1, 3, 512, 512), dtype=np.uint8))

    def run(kernel):
        monkeypatch.setattr(cg, "_TABLES_KERNEL", kernel)
        cg.clahe_rgb_u8_planar_gather5.clear_cache()
        return np.asarray(
            cg.clahe_rgb_u8_planar_gather5(x, tiles_x=16, tiles_y=16, interpret=True)
        )

    np.testing.assert_array_equal(run(False), run(True))


def test_band_override_bit_identity(img):
    """_FWD_NB/_APPLY_NB band overrides (perf_lab r5exact knobs) only
    re-partition the kernel grid: outputs must be bit-identical to the
    default banding, including an ODD band count (dynamic ya parity path)."""
    import retinex_tpu.ops.clahe_gather as cg

    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
    xp = jnp.transpose(u8, (0, 3, 1, 2))
    raw = cg.clahe_rgb_u8_planar_gather5.__wrapped__
    ref = np.asarray(jax.jit(lambda v: raw(v, interpret=True))(xp))
    try:
        for fwd_nb, apply_nb in ((2, 2), (8, 8), (1, 1), (None, 2)):
            cg._FWD_NB, cg._APPLY_NB = fwd_nb, apply_nb
            got = np.asarray(jax.jit(lambda v: raw(v, interpret=True))(xp))
            assert (got == ref).all(), (fwd_nb, apply_nb)
    finally:
        cg._FWD_NB = cg._APPLY_NB = None
