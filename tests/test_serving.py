"""Serving export (infer/serving.py): StableHLO artifact round trip, symbolic
batch, byte parity with the live pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinex_tpu.infer.serving import export_enhancer, load_enhancer, make_serving_fn
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex


@pytest.fixture(scope="module")
def model_and_vars():
    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    return model, variables


def test_export_roundtrip_file_and_symbolic_batch(model_and_vars, tmp_path):
    model, variables = model_and_vars
    path = tmp_path / "enhancer_64x96.shlo"
    blob = export_enhancer(model, variables, height=64, width=96, path=str(path))
    assert path.read_bytes() == blob

    served = load_enhancer(str(path))
    live = jax.jit(make_serving_fn(model, variables))

    rng = np.random.default_rng(1)
    for batch in (1, 3):  # one artifact serves any batch size
        x = rng.integers(0, 256, (batch, 64, 96, 3), dtype=np.uint8)
        enh_s, illu_s = served(x)
        enh_l, illu_l = live(x)
        np.testing.assert_array_equal(np.asarray(enh_s), np.asarray(enh_l))
        np.testing.assert_array_equal(np.asarray(illu_s), np.asarray(illu_l))


def test_export_rejects_wrong_canvas(model_and_vars):
    model, variables = model_and_vars
    served = load_enhancer(export_enhancer(model, variables, height=64, width=96))
    bad = np.zeros((1, 32, 96, 3), np.uint8)
    with pytest.raises(Exception):
        served(bad)


def test_enhance_artifact_matches_offline_enhance(model_and_vars, tmp_path):
    """The default 'enhance' artifact applies the full adaptive-CLAHE
    post-processing — served bytes equal the offline batched driver's
    net-mode outputs (review finding: an export of the raw forward silently
    diverged from what users validate with --mode enhance)."""
    import os

    from PIL import Image

    from retinex_tpu.infer.enhance import enhance_batch_images

    model, variables = model_and_vars

    def apply_fn(batch):
        return model.apply(variables, batch, train=False)

    rng = np.random.default_rng(4)
    d = tmp_path / "in"
    d.mkdir()
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    Image.fromarray(img).save(d / "a.png")

    out = tmp_path / "offline"
    enhance_batch_images(apply_fn, str(d), str(out), batch_size=1)

    served = load_enhancer(export_enhancer(model, variables, height=64, width=96))
    enh_u8, _illu_u8 = served(img[None])
    offline = np.asarray(Image.open(out / "a_enhanced.png"))
    np.testing.assert_array_equal(np.asarray(enh_u8)[0], offline)


def test_predict_artifact_serves_raw_outputs(model_and_vars):
    model, variables = model_and_vars
    served = load_enhancer(
        export_enhancer(model, variables, height=64, width=96, pipeline="predict")
    )
    x = np.random.default_rng(5).integers(0, 256, (1, 64, 96, 3), dtype=np.uint8)
    enh, illu = served(x)
    want_enh, _refl, want_illu = model.apply(
        variables, jnp.asarray(x, jnp.float32) / 255.0, train=False
    )
    q = lambda v: np.clip(np.floor(np.asarray(v) * 255.0), 0, 255).astype(np.uint8)  # noqa: E731
    np.testing.assert_array_equal(np.asarray(enh), q(want_enh))
    np.testing.assert_array_equal(np.asarray(illu), q(want_illu))


@pytest.mark.parametrize("mode", ["clahe", "msr"])
def test_classical_artifact_matches_offline(mode, tmp_path):
    """No-net classical pipelines export too; served bytes equal the offline
    batched driver's outputs."""
    import os

    from PIL import Image

    from retinex_tpu.infer.enhance import enhance_batch_images
    from retinex_tpu.infer.serving import export_classical

    rng = np.random.default_rng(6)
    d = tmp_path / "in"
    d.mkdir()
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    Image.fromarray(img).save(d / "a.png")
    out = tmp_path / "offline"
    enhance_batch_images(None, str(d), str(out), classical_mode=mode, batch_size=1)

    served = load_enhancer(export_classical(mode, height=64, width=96))
    enh = np.asarray(served(img[None]))[0]
    offline = np.asarray(Image.open(out / "a_enhanced.png"))
    np.testing.assert_array_equal(enh, offline)


def test_classical_artifact_luma_hist_subsample(tmp_path):
    """clahe_luma exports carry the decimated-histogram knob; served bytes
    equal the offline driver at the same s and differ from s=1."""
    from PIL import Image

    from retinex_tpu.infer.enhance import enhance_batch_images
    from retinex_tpu.infer.serving import export_classical

    rng = np.random.default_rng(7)
    d = tmp_path / "in"
    d.mkdir()
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    Image.fromarray(img).save(d / "a.png")
    out = tmp_path / "offline"
    enhance_batch_images(
        None, str(d), str(out), classical_mode="clahe_luma", batch_size=1,
        hist_subsample=2,
    )

    served = load_enhancer(
        export_classical("clahe_luma", height=64, width=96, hist_subsample=2)
    )
    enh = np.asarray(served(img[None]))[0]
    offline = np.asarray(Image.open(out / "a_enhanced.png"))
    np.testing.assert_array_equal(enh, offline)

    served_s1 = load_enhancer(export_classical("clahe_luma", height=64, width=96))
    assert np.abs(np.asarray(served_s1(img[None]))[0].astype(int) - enh.astype(int)).max() > 0
