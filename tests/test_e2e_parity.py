"""End-to-end enhance-pipeline parity vs the torch+OpenCV reference, with the
SAME (converted) model weights on both sides, on a real low-light photo."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from retinex_tpu.models import MultiScaleUPRetinex
from retinex_tpu.models.convert import torch_state_dict_to_variables

SRC = "/root/reference/data/input/102904222-004389-004389.jpg"


@pytest.fixture(autouse=True)
def _high_precision():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old or "default")


@pytest.fixture(scope="module")
def models(reference_path):
    import torch

    from models.model import MultiScaleUP_Retinex

    torch.manual_seed(0)
    tm = MultiScaleUP_Retinex(use_preact=False, use_aspp=False).eval()
    variables = torch_state_dict_to_variables(tm.state_dict(), False, False)
    fm = MultiScaleUPRetinex(use_preact=False, use_aspp=False)

    def apply_fn(batch):
        return fm.apply(variables, batch, train=False)

    return tm, apply_fn


@pytest.fixture(scope="module")
def image():
    img = np.asarray(Image.open(SRC).convert("RGB"))[:128, :128]
    return img.astype(np.float32) / 255.0


def test_content_aware_e2e(models, image):
    import torch

    from enhancers.content_aware import ContentAwareEnhancer as RefEnhancer

    from retinex_tpu.infer.enhance import ContentAwareEnhancer

    tm, apply_fn = models
    t_in = torch.from_numpy(image.transpose(2, 0, 1))[None]
    want_img, want_illu = RefEnhancer().apply_content_aware_enhancement(tm, t_in, "cpu")

    x = jnp.asarray(image)[None]
    got_img, got_illu = ContentAwareEnhancer().apply_content_aware_enhancement(apply_fn, x)

    d = np.abs(want_img.numpy().transpose(0, 2, 3, 1) - np.asarray(got_img)) * 255.0
    assert np.percentile(d, 99) < 2.0, np.percentile(d, 99)
    d_illu = np.abs(want_illu.numpy().transpose(0, 2, 3, 1) - np.asarray(got_illu)) * 255.0
    assert d_illu.max() < 1.0


def test_multi_scale_e2e(models, image):
    import torch

    from enhancers.multi_scale import MultiScaleEnhancer as RefEnhancer

    from retinex_tpu.infer.enhance import MultiScaleEnhancer

    tm, apply_fn = models
    t_in = torch.from_numpy(image.transpose(2, 0, 1))[None]
    want_img, _ = RefEnhancer().enhance_with_pyramid(tm, t_in, "cpu")

    x = jnp.asarray(image)[None]
    got_img, _ = MultiScaleEnhancer().enhance_with_pyramid(apply_fn, x)

    d = np.abs(want_img.numpy().transpose(0, 2, 3, 1) - np.asarray(got_img)) * 255.0
    assert d.max() < 2.0, d.max()


def test_adaptive_clahe_e2e(models, image):
    import torch

    from enhancers.adaptive_params import AdaptiveParameterAdjuster as RefAdjuster

    from retinex_tpu.infer.adaptive_params import AdaptiveParameterAdjuster

    tm, apply_fn = models
    t_in = torch.from_numpy(image.transpose(2, 0, 1))[None]
    want_img, _ = RefAdjuster().apply_adaptive_enhancement(tm, t_in, "cpu")

    x = jnp.asarray(image)[None]
    got_img, _ = AdaptiveParameterAdjuster().apply_adaptive_enhancement(apply_fn, x)

    d = np.abs(want_img.numpy().transpose(0, 2, 3, 1) - np.asarray(got_img)) * 255.0
    # cv2's fixed-point Lab + CLAHE over a slightly-different net output.
    assert np.percentile(d, 99) < 6.0, np.percentile(d, 99)
    assert d.mean() < 2.5, d.mean()


def test_adaptive_features_parity(models, image, reference_path):
    """Brightness features vs the reference's OpenCV path."""
    import torch

    from enhancers.adaptive_params import AdaptiveParameterAdjuster as RefAdjuster

    from retinex_tpu.infer.adaptive_params import AdaptiveParameterAdjuster

    t_in = torch.from_numpy(image.transpose(2, 0, 1))[None]
    want = RefAdjuster().calculate_brightness_features(t_in)
    got = AdaptiveParameterAdjuster().calculate_brightness_features(jnp.asarray(image)[None])
    for key in want:
        assert abs(want[key] - got[key]) < 0.02, (key, want[key], got[key])
    want_p = RefAdjuster().adjust_parameters(t_in)
    got_p = AdaptiveParameterAdjuster().adjust_parameters(jnp.asarray(image)[None])
    assert want_p == got_p
