"""Enhance pipelines: saliency/attention/feature parity vs the torch+OpenCV
reference, and end-to-end runs of all three net pipelines + classical modes."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from retinex_tpu.infer.enhance import (
    ContentAwareEnhancer,
    MultiScaleEnhancer,
    compute_attention_map,
    compute_saliency_map,
    enhance_single_image,
    extract_multi_scale_features,
)


def test_saliency_map_parity(reference_path, rng):
    import torch

    from enhancers.content_aware import ContentAwareEnhancer as RefEnhancer

    img = rng.random((1, 3, 96, 96), dtype=np.float32)
    want = RefEnhancer().compute_saliency_map(torch.from_numpy(img)).numpy()[0, 0]
    got = np.asarray(compute_saliency_map(jnp.asarray(img.transpose(0, 2, 3, 1))))[0, :, :, 0]
    diff = np.abs(want - got)
    # cv2 computes the Laplacian on uint8 with fixed-point; normalized maps
    # agree to ~1e-2 everywhere.
    assert diff.max() < 0.05, diff.max()
    assert diff.mean() < 0.005


def test_attention_map_parity(reference_path, rng):
    import torch

    from enhancers.content_aware import ContentAwareEnhancer as RefEnhancer

    img = rng.random((1, 3, 96, 96), dtype=np.float32)
    want = RefEnhancer().compute_attention_map(torch.from_numpy(img)).numpy()[0, 0]
    got = np.asarray(compute_attention_map(jnp.asarray(img.transpose(0, 2, 3, 1))))[0, :, :, 0]
    assert np.abs(want - got).max() < 0.05


def test_multi_scale_features_parity(reference_path, rng):
    import torch

    from enhancers.multi_scale import MultiScaleEnhancer as RefEnhancer

    img = rng.random((1, 3, 64, 64), dtype=np.float32)
    want = RefEnhancer().extract_multi_scale_features(torch.from_numpy(img))
    got = extract_multi_scale_features(jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert len(want) == len(got) == 3
    for w, g in zip(want, got):
        wn = w.numpy().transpose(0, 2, 3, 1)
        gn = np.asarray(g)
        assert wn.shape == gn.shape
        np.testing.assert_allclose(gn, wn, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_apply_fn():
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    @jax.jit
    def apply_fn(batch):
        return model.apply(variables, batch, train=False)

    return apply_fn


def test_content_aware_pipeline(tiny_apply_fn, rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    out, illu = ContentAwareEnhancer().apply_content_aware_enhancement(tiny_apply_fn, x)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert illu.shape == (1, 64, 64, 1)


def test_multi_scale_pipeline(tiny_apply_fn, rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    out, illu = MultiScaleEnhancer().enhance_with_pyramid(tiny_apply_fn, x)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_adaptive_clahe_pipeline(tiny_apply_fn, rng):
    from retinex_tpu.infer.adaptive_params import AdaptiveParameterAdjuster

    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    out, illu = AdaptiveParameterAdjuster().apply_adaptive_enhancement(tiny_apply_fn, x)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_adaptive_clahe_pipeline_under_jit(tiny_apply_fn, rng):
    # The batched enhance driver jits the whole net-mode pipeline
    # (infer/enhance.py quantized_pipeline); apply_adaptive_enhancement must
    # be traceable (its discarded adjust_parameters parity call branches on
    # host floats and is skipped under a trace — regression: it used to
    # raise ConcretizationTypeError on the first batched net-mode dispatch).
    import jax

    from retinex_tpu.infer.adaptive_params import AdaptiveParameterAdjuster

    adj = AdaptiveParameterAdjuster()
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    eager_out, eager_illu = adj.apply_adaptive_enhancement(tiny_apply_fn, x)
    jit_out, jit_illu = jax.jit(
        lambda v: adj.apply_adaptive_enhancement(tiny_apply_fn, v)
    )(x)
    np.testing.assert_allclose(
        np.asarray(jit_out), np.asarray(eager_out), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jit_illu), np.asarray(eager_illu), atol=1e-5
    )


def test_adaptive_params_rule_table(rng):
    from retinex_tpu.infer.adaptive_params import AdaptiveParameterAdjuster

    adj = AdaptiveParameterAdjuster()
    dark = jnp.full((1, 32, 32, 3), 0.05, jnp.float32)
    p = adj.adjust_parameters(dark)
    assert p["enhance_strength"] == 1.5 and p["brightness_boost"] == 1.3
    bright = jnp.full((1, 32, 32, 3), 0.9, jnp.float32)
    p2 = adj.adjust_parameters(bright)
    assert p2["enhance_strength"] == 0.8


def test_enhance_single_image_end_to_end(tiny_apply_fn, tmp_path):
    src = "/root/reference/data/input/102708607-003694-003694.jpg"
    out_dir = str(tmp_path / "out")
    enhanced, illu, elapsed = enhance_single_image(
        tiny_apply_fn, src, out_dir, max_size=128
    )
    name = "102708607-003694-003694"
    assert os.path.exists(os.path.join(out_dir, f"{name}_enhanced.png"))
    assert os.path.exists(os.path.join(out_dir, f"{name}_illumination.png"))
    assert os.path.exists(os.path.join(out_dir, f"{name}_comparison.png"))
    assert elapsed > 0


def test_enhance_classical_modes(tmp_path):
    src = "/root/reference/data/input/102708607-003694-003694.jpg"
    for mode in ("ssr", "msr", "msrcr"):
        out_dir = str(tmp_path / mode)
        enhanced, _, _ = enhance_single_image(
            None, src, out_dir, max_size=128, classical_mode=mode
        )
        arr = np.asarray(enhanced)
        assert np.isfinite(arr).all()
        assert os.path.exists(os.path.join(out_dir, "102708607-003694-003694_enhanced.png"))


def test_enhance_hist_subsample_plumbing(tmp_path):
    """--clahe_hist_subsample reaches the luma kernel: the s=2 single-image
    enhance equals calling clahe_luma_rgb with hist_subsample=2 directly, and
    differs from the exact-histogram (s=1) output."""
    from retinex_tpu.infer.enhance import load_image
    from retinex_tpu.ops.clahe_luma import clahe_luma_rgb

    src = "/root/reference/data/input/102708607-003694-003694.jpg"
    img, _ = load_image(src, 128)
    o1, _, _ = enhance_single_image(
        None, src, str(tmp_path / "s1"), max_size=128, classical_mode="clahe_luma"
    )
    o2, _, _ = enhance_single_image(
        None, src, str(tmp_path / "s2"), max_size=128, classical_mode="clahe_luma",
        hist_subsample=2,
    )
    want = clahe_luma_rgb(jnp.asarray(img), hist_subsample=2)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(want), atol=1e-7)
    assert np.abs(np.asarray(o2) - np.asarray(o1)).max() > 0


def test_enhance_exact_clahe_hist_subsample_plumbing(tmp_path):
    """The same knob reaches the exact-Lab `clahe` route (PARITY #20 round-5
    addendum: full Lab pipeline, decimated histogram input): the s=2 enhance
    equals clahe_lab_rgb(hist_subsample=2) directly and differs from s=1."""
    from retinex_tpu.infer.enhance import load_image
    from retinex_tpu.ops.clahe import clahe_lab_rgb

    src = "/root/reference/data/input/102708607-003694-003694.jpg"
    img, _ = load_image(src, 128)
    o1, _, _ = enhance_single_image(
        None, src, str(tmp_path / "s1"), max_size=128, classical_mode="clahe",
        use_pallas=False,
    )
    o2, _, _ = enhance_single_image(
        None, src, str(tmp_path / "s2"), max_size=128, classical_mode="clahe",
        use_pallas=False, hist_subsample=2,
    )
    want = clahe_lab_rgb(jnp.asarray(img), use_pallas=False, hist_subsample=2)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(want), atol=1e-7)
    assert np.abs(np.asarray(o2) - np.asarray(o1)).max() > 0
