"""Batched enhance driver: shape bucketing, batched dispatch, output parity."""

import os

import numpy as np
import pytest
from PIL import Image

from retinex_tpu.infer.enhance import enhance_batch_images, enhance_single_image


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "in"
    d.mkdir()
    # Two shape buckets: 3x 96x64 and 2x 64x96 (letterbox to different /32 canvases)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)).save(
            d / f"tall_{i}.png"
        )
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            d / f"wide_{i}.png"
        )
    return d


def test_batched_clahe_matches_single(image_dir, tmp_path):
    out_b = tmp_path / "batched"
    out_s = tmp_path / "single"
    timings = enhance_batch_images(
        None, str(image_dir), str(out_b), classical_mode="clahe", batch_size=4
    )
    assert len(timings) == 5
    # all outputs present
    for f in os.listdir(image_dir):
        name = os.path.splitext(f)[0]
        for suffix in ("enhanced", "illumination", "comparison"):
            assert (out_b / f"{name}_{suffix}.png").exists(), f"{name}_{suffix}"

    # pixel parity vs the per-image path
    enhance_single_image(
        None, str(image_dir / "tall_0.png"), str(out_s), classical_mode="clahe"
    )
    a = np.asarray(Image.open(out_b / "tall_0_enhanced.png"))
    b = np.asarray(Image.open(out_s / "tall_0_enhanced.png"))
    np.testing.assert_array_equal(a, b)


def test_batched_net_mode_matches_single(image_dir, tmp_path):
    # Net mode (classical_mode=None — the CLI's default adaptive+CLAHE path)
    # jits the whole per-bucket pipeline including the net forward; it was
    # untested batched and regressed with a ConcretizationTypeError inside
    # apply_adaptive_enhancement (round 3).
    import jax
    import jax.numpy as jnp

    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    def apply_fn(batch):
        return model.apply(variables, batch, train=False)

    out_b = tmp_path / "batched"
    out_s = tmp_path / "single"
    timings = enhance_batch_images(
        apply_fn, str(image_dir), str(out_b), batch_size=4
    )
    assert len(timings) == 5
    for suffix in ("enhanced", "illumination", "comparison"):
        assert (out_b / f"tall_0_{suffix}.png").exists()

    enhance_single_image(apply_fn, str(image_dir / "tall_0.png"), str(out_s))
    a = np.asarray(Image.open(out_b / "tall_0_enhanced.png"))
    b = np.asarray(Image.open(out_s / "tall_0_enhanced.png"))
    # Same graph modulo jit boundaries; allow 1-level rounding skew.
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_batched_clahe_luma_matches_single(image_dir, tmp_path):
    out_b = tmp_path / "batched_luma"
    out_s = tmp_path / "single_luma"
    timings = enhance_batch_images(
        None, str(image_dir), str(out_b), classical_mode="clahe_luma", batch_size=4
    )
    assert len(timings) == 5
    enhance_single_image(
        None, str(image_dir / "wide_0.png"), str(out_s), classical_mode="clahe_luma"
    )
    a = np.asarray(Image.open(out_b / "wide_0_enhanced.png"))
    b = np.asarray(Image.open(out_s / "wide_0_enhanced.png"))
    np.testing.assert_array_equal(a, b)


def test_batched_clahe_luma_hist_subsample_matches_single(image_dir, tmp_path):
    # The decimated-histogram knob must reach the batched pipeline too, and
    # batched == single-image byte-for-byte at the same s.
    out_b = tmp_path / "batched_s2"
    out_s = tmp_path / "single_s2"
    enhance_batch_images(
        None, str(image_dir), str(out_b), classical_mode="clahe_luma",
        batch_size=4, hist_subsample=2,
    )
    enhance_single_image(
        None, str(image_dir / "wide_0.png"), str(out_s),
        classical_mode="clahe_luma", hist_subsample=2,
    )
    a = np.asarray(Image.open(out_b / "wide_0_enhanced.png"))
    b = np.asarray(Image.open(out_s / "wide_0_enhanced.png"))
    np.testing.assert_array_equal(a, b)


def test_batched_msr_runs(image_dir, tmp_path):
    timings = enhance_batch_images(
        None, str(image_dir), str(tmp_path / "msr"), classical_mode="msr", batch_size=8
    )
    assert len(timings) == 5


def test_single_image_clahe_mode(image_dir, tmp_path):
    enhanced, illu, elapsed = enhance_single_image(
        None, str(image_dir / "wide_0.png"), str(tmp_path / "o"), classical_mode="clahe"
    )
    assert enhanced.ndim == 3 and float(np.asarray(enhanced).max()) <= 1.0


def test_native_decode_failure_warns_and_falls_back(image_dir, monkeypatch):
    """A broken C++ decode path must degrade to PIL with a once-per-process
    RuntimeWarning — never silently (round-2 review finding)."""
    import warnings

    import retinex_tpu.data.native_loader as nl
    import retinex_tpu.infer.batch_driver as bd

    def boom(*a, **k):
        raise RuntimeError("forced native failure")

    monkeypatch.setattr(nl, "native_available", lambda: True)
    monkeypatch.setattr(nl, "decode_letterbox_batch_canvas", boom)
    monkeypatch.setattr(bd, "_warned_native_fallback", False)

    paths = [str(image_dir / "tall_0.png"), str(image_dir / "tall_1.png")]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        batch = bd.decode_bucket(paths, 96, 96, 64, num_workers=2)
        # second call: warning fires only once per process
        bd.decode_bucket(paths, 96, 96, 64, num_workers=2)
    assert batch.shape == (2, 96, 64, 3) and batch.dtype == np.uint8
    warned = [w for w in rec if issubclass(w.category, RuntimeWarning)]
    assert len(warned) == 1 and "forced native failure" in str(warned[0].message)


def test_sharded_enhance_matches_single_device(image_dir, tmp_path):
    """Multi-chip batch-parallel enhance: chunks sharded over an 8-device data
    mesh must produce byte-identical PNGs to the single-device path (the
    pipeline is per-image; shard_map adds no cross-image math)."""
    from retinex_tpu.parallel.mesh import create_mesh

    out_1 = tmp_path / "dev1"
    out_8 = tmp_path / "dev8"
    enhance_batch_images(
        None, str(image_dir), str(out_1), classical_mode="clahe", batch_size=4
    )
    mesh = create_mesh(8)
    timings = enhance_batch_images(
        None, str(image_dir), str(out_8), classical_mode="clahe", batch_size=4,
        mesh=mesh,
    )
    assert len(timings) == 5
    for f in os.listdir(out_1):
        a = np.asarray(Image.open(out_1 / f))
        b = np.asarray(Image.open(out_8 / f))
        np.testing.assert_array_equal(a, b, err_msg=f)


def test_sharded_clahe_luma_matches_single_device(image_dir, tmp_path):
    from retinex_tpu.parallel.mesh import create_mesh

    out_1 = tmp_path / "luma1"
    out_8 = tmp_path / "luma8"
    enhance_batch_images(
        None, str(image_dir), str(out_1), classical_mode="clahe_luma", batch_size=4
    )
    timings = enhance_batch_images(
        None, str(image_dir), str(out_8), classical_mode="clahe_luma", batch_size=4,
        mesh=create_mesh(8),
    )
    assert len(timings) == 5
    for f in os.listdir(out_1):
        a = np.asarray(Image.open(out_1 / f))
        b = np.asarray(Image.open(out_8 / f))
        np.testing.assert_array_equal(a, b, err_msg=f)


@pytest.mark.parametrize("mode_kwargs", [
    {"enable_multi_scale": True},
    {"enable_content_aware": True},
])
def test_batched_multiscale_contentaware_match_single(image_dir, tmp_path, mode_kwargs):
    """Round 3: multi-scale and content-aware route through the batched
    driver too (the reference skips them in batch mode,
    enhancers/simple_enhance.py:81) with PER-IMAGE statistics — outputs match
    the single-image path within +-1/255 on a sub-percent pixel fraction
    (these pipelines are float-valued, so XLA fusion differences between the
    batch-4 and batch-1 graphs can flip the uint8 floor at exact-boundary
    values; the CLAHE paths are u8-grid-exact and assert equality)."""
    import jax
    import jax.numpy as jnp

    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    def apply_fn(batch):
        return model.apply(variables, batch, train=False)

    out_b = tmp_path / "batched"
    out_s = tmp_path / "single"
    timings = enhance_batch_images(
        apply_fn, str(image_dir), str(out_b), batch_size=4, **mode_kwargs
    )
    assert len(timings) == 5
    for fname in ("tall_0.png", "wide_1.png"):
        enhance_single_image(
            apply_fn, str(image_dir / fname), str(out_s), **mode_kwargs
        )
        name = os.path.splitext(fname)[0]
        for suffix in ("enhanced", "illumination"):
            a = np.asarray(Image.open(out_b / f"{name}_{suffix}.png")).astype(int)
            b = np.asarray(Image.open(out_s / f"{name}_{suffix}.png")).astype(int)
            d = np.abs(a - b)
            assert d.max() <= 1, f"{name}_{suffix}: max diff {d.max()}"
            frac = (d > 0).mean()
            assert frac < 0.005, f"{name}_{suffix}: {frac:.2%} pixels differ"
