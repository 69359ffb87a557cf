"""Golden tests: each loss vs the torch reference implementation on identical
random tensors. The perceptual loss is tested against a hand-built torch VGG19
mirror with shared random weights (torchvision isn't available here)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from retinex_tpu.losses import losses as L
from retinex_tpu.losses.total import LossConfig, LossState, TotalLoss


@pytest.fixture(autouse=True)
def _high_precision():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old or "default")


def _tensors(rng, b=2, c=3, h=64, w=64):
    import torch

    arrs = {
        "low": rng.random((b, c, h, w), dtype=np.float32),
        "enh": rng.random((b, c, h, w), dtype=np.float32),
        "illu3": rng.random((b, c, h, w), dtype=np.float32),
        "illu1": rng.random((b, 1, h, w), dtype=np.float32),
        "refl": rng.random((b, c, h, w), dtype=np.float32) * 2.0,
    }
    torch_t = {k: torch.from_numpy(v) for k, v in arrs.items()}
    jax_t = {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in arrs.items()}
    return torch_t, jax_t


def test_exposure_loss_parity(reference_path, rng):
    from losses.loss import AdaptiveExposureLoss

    tt, jt = _tensors(rng)
    want = float(AdaptiveExposureLoss()(tt["enh"], tt["low"]))
    got = float(L.exposure_loss(jt["enh"], jt["low"]))
    assert abs(want - got) < 1e-5


def test_smoothness_loss_parity(reference_path, rng):
    from losses.loss import EdgeAwareSmoothnessLoss

    tt, jt = _tensors(rng)
    want = float(EdgeAwareSmoothnessLoss()(tt["illu1"], tt["low"]))
    got = float(L.smoothness_loss(jt["illu1"], jt["low"]))
    assert abs(want - got) < 1e-5, (want, got)


def test_color_loss_parity(reference_path, rng):
    from losses.loss import ColorLoss

    tt, jt = _tensors(rng)
    want = float(ColorLoss()(tt["enh"]))
    got = float(L.color_loss(jt["enh"]))
    assert abs(want - got) < 1e-6


def test_spatial_loss_parity(reference_path, rng):
    from losses.loss import SpatialConsistencyLoss

    tt, jt = _tensors(rng)
    want = float(SpatialConsistencyLoss()(tt["enh"], tt["low"]))
    got = float(L.spatial_consistency_loss(jt["enh"], jt["low"]))
    assert abs(want - got) < 1e-6


@pytest.mark.parametrize("illu_key", ["illu1", "illu3"])
def test_decoupling_loss_parity(reference_path, rng, illu_key):
    from losses.loss import IlluminationReflectanceDecouplingLoss

    tt, jt = _tensors(rng)
    want = float(IlluminationReflectanceDecouplingLoss()(tt[illu_key], tt["refl"]))
    got = float(L.decoupling_loss(jt[illu_key], jt["refl"]))
    assert abs(want - got) / max(abs(want), 1.0) < 1e-4, (want, got)


def test_frequency_loss_parity(reference_path, rng):
    from losses.loss import FrequencyLoss

    tt, jt = _tensors(rng)
    want = float(FrequencyLoss()(tt["enh"], tt["low"]))
    got = float(L.frequency_loss(jt["enh"], jt["low"]))
    assert abs(want - got) / max(abs(want), 1.0) < 1e-4, (want, got)


@pytest.mark.parametrize("method", ["tv", "edge_density"])
def test_texture_complexity_parity(reference_path, rng, method):
    from losses.loss import calculate_texture_complexity

    tt, jt = _tensors(rng)
    want = calculate_texture_complexity(tt["low"], method=method).numpy()
    got = np.asarray(L.texture_complexity(jt["low"], method=method))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _torch_vgg_mirror(seed=0):
    """Build a torch Sequential shaped exactly like torchvision vgg19.features
    indices 0..18, with seeded random weights."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    layers = []
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M"]
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            in_ch = v
    return tnn.Sequential(*layers)


def test_perceptual_loss_parity(rng):
    """Perceptual loss math vs a torch mirror of the reference's slicing
    (losses/loss.py:198-253), with identical (random) VGG weights."""
    import torch
    import torch.nn.functional as TF

    from retinex_tpu.models.vgg import VGG19Features, load_torch_state_dict

    vgg_t = _torch_vgg_mirror()
    tt, jt = _tensors(rng, h=64, w=64)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def torch_feats(x):
        x = (x - mean) / std
        outs = []
        for i, layer in enumerate(vgg_t):
            x = layer(x)
            if i in (4, 9, 18):  # the reference's slice boundaries
                outs.append(x)
        return outs

    with torch.no_grad():
        fe = torch_feats(tt["enh"])
        fl = torch_feats(tt["low"])
        want = sum(float(TF.mse_loss(a, b)) for a, b in zip(fe, fl))

    variables = load_torch_state_dict(vgg_t.state_dict())
    model = VGG19Features()
    vgg_apply = lambda x: model.apply({"params": variables["params"]}, x)  # noqa: E731
    got = float(L.perceptual_loss(vgg_apply, jt["enh"], jt["low"]))
    assert abs(want - got) / max(abs(want), 1e-8) < 1e-3, (want, got)


def test_total_loss_parity(reference_path, rng):
    """TotalLoss (without perceptual/freq, which are covered above) vs the
    reference aggregator with weight_perceptual=0."""
    import torch

    from losses.loss import TotalLoss as RefTotalLoss

    tt, jt = _tensors(rng)

    # Reference TotalLoss instantiates a VGG (downloads weights) unless we
    # bypass it; patch its PerceptualLoss with a zero stub.
    import losses.loss as ref_loss_mod

    class _ZeroPerceptual(torch.nn.Module):
        def forward(self, a, b):
            return torch.tensor(0.0)

    orig = ref_loss_mod.PerceptualLoss
    ref_loss_mod.PerceptualLoss = lambda *a, **k: _ZeroPerceptual()
    try:
        ref_total = RefTotalLoss(use_freq_loss=True, adaptive_weights=False)
    finally:
        ref_loss_mod.PerceptualLoss = orig

    with torch.no_grad():
        want, want_dict = ref_total(tt["low"], tt["enh"], tt["illu1"], tt["refl"])

    cfg = LossConfig(use_freq_loss=True, use_perceptual_loss=False)
    total = TotalLoss(cfg, vgg_apply=None)
    got, got_dict, state = total(jt["low"], jt["enh"], jt["illu1"], jt["refl"])

    assert abs(float(want) - float(got)) / max(abs(float(want)), 1.0) < 1e-4
    for key in ("exposure", "smoothness", "color", "spatial", "decouple", "frequency"):
        assert abs(want_dict[key] - float(got_dict[key])) / max(abs(want_dict[key]), 1.0) < 1e-3, key
    assert int(state.step) == 1


def test_dwa_weights_activate_after_two_steps(rng):
    cfg = LossConfig(adaptive_weights=True, use_perceptual_loss=False, use_dynamic_smooth_weight=False)
    total = TotalLoss(cfg)
    _, jt = _tensors(rng, h=32, w=32)
    state = LossState.create()
    t0, _, state = total(jt["low"], jt["enh"], jt["illu1"], jt["refl"], state)
    t1, _, state = total(jt["low"], jt["enh"], jt["illu1"], jt["refl"], state)
    t2, _, state = total(jt["low"], jt["enh"], jt["illu1"], jt["refl"], state)
    # Same inputs => identical component losses; after history exists the DWA
    # weights renormalize to sum to 7 so the total changes.
    assert float(t0) == pytest.approx(float(t1))
    assert float(t2) != pytest.approx(float(t1))
    assert int(state.step) == 3
