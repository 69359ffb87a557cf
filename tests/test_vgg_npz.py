"""The pretrained-VGG perceptual path a real user follows:

    scripts/export_vgg.py (torchvision machine)  ->  .npz
    --vgg_weights path  ->  models/vgg.load_npz  ->  perceptual loss

torchvision isn't installed here, so the "pretrained" weights are a
fixed-seed random torch Sequential with torchvision's exact `vgg19.features`
layer indices — the export/format/load/compute code path is identical
(reference behavior: losses/loss.py:195-211)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/scripts")
from export_vgg import export_features  # noqa: E402

from retinex_tpu.models.vgg import VGG19Features, load_npz  # noqa: E402


def _torch_vgg19_features():
    """torchvision vgg19().features[0:19] structure (indices match)."""
    import torch.nn as tnn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(cin, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            cin = v
    return tnn.Sequential(*layers)


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    torch.manual_seed(0)
    feats = _torch_vgg19_features().eval()
    path = tmp_path_factory.mktemp("vgg") / "vgg19_features.npz"
    n = export_features(feats, str(path))
    assert n == 16  # 8 convs x (weight, bias)
    return str(path), feats


def test_export_load_roundtrip_matches_torch(npz_path):
    path, feats = npz_path
    variables = load_npz(path)
    model = VGG19Features()

    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 64, 3), dtype=np.float32)
    f1, f2, f3 = model.apply(variables, jnp.asarray(x))

    # torch forward with the same ImageNet normalization, slice at pools.
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xt = (torch.from_numpy(x).permute(0, 3, 1, 2) - mean) / std
    with torch.no_grad():
        t = xt
        torch_feats = []
        for i, layer in enumerate(feats):
            t = layer(t)
            if i in (4, 9, 18):  # pool1 / pool2 / pool3 (loss.py:203-211)
                torch_feats.append(t.permute(0, 2, 3, 1).numpy())
    for got, want in zip((f1, f2, f3), torch_feats):
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_vgg_weights_config_path_reaches_loss(npz_path, tmp_path):
    """The end-to-end user path: Config(vgg_weights=...) -> build_vgg_apply ->
    TotalLoss perceptual term, and the weights actually matter."""
    path, _ = npz_path
    from retinex_tpu.config import Config
    from retinex_tpu.losses.total import LossState
    from retinex_tpu.train.trainer import build_criterion

    rng = np.random.default_rng(1)
    low = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32) * 0.3)
    enh = jnp.clip(low * 2.0, 0, 1)
    illu = jnp.full((1, 32, 32, 1), 0.5, jnp.float32)
    refl = low / (illu + 1e-6)

    def percep(cfg):
        criterion = build_criterion(cfg)
        _total, aux, _state = criterion(low, enh, illu, refl, LossState.create())
        return float(aux["perceptual"])

    with_npz = percep(Config(vgg_weights=path))
    he_init = percep(Config(vgg_weights=None))
    assert np.isfinite(with_npz) and with_npz > 0
    assert abs(with_npz - he_init) > 1e-8, "vgg_weights had no effect on the loss"


def test_load_npz_missing_key_errors(tmp_path):
    bad = tmp_path / "bad.npz"
    np.savez(bad, **{"0.weight": np.zeros((64, 3, 3, 3), np.float32)})
    with pytest.raises(KeyError):
        load_npz(str(bad))
