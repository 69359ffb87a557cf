"""End-to-end training: a tiny run over the 8-device CPU mesh — losses finite
and decreasing, checkpoints written, resume exact, observability artifacts."""

import os

import numpy as np
import pytest
from PIL import Image

from retinex_tpu.config import Config


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("train_imgs")
    rng = np.random.default_rng(0)
    for i in range(8):
        # Dim random images ~ low-light inputs.
        img = (rng.random((80, 100, 3)) * 80).astype(np.uint8)
        Image.fromarray(img).save(d / f"img_{i}.png")
    return str(d)


def _tiny_config(tiny_dataset, save_dir, **overrides) -> Config:
    base = dict(
        mode="train",
        train_dir=tiny_dataset,
        save_dir=save_dir,
        num_epochs=2,
        batch_size=8,
        image_size=64,
        lr=1e-3,
        num_workers=2,
        use_perceptual_loss=False,  # keep the CPU test fast
        use_freq_loss=True,
        patience=50,
        log_every=1,
    )
    base.update(overrides)
    return Config(**base)


def test_train_two_epochs(tiny_dataset, tmp_path):
    from retinex_tpu.train.trainer import train

    cfg = _tiny_config(tiny_dataset, str(tmp_path / "ckpt"))
    result = train(cfg)
    assert result["epochs_run"] == 2
    assert np.isfinite(result["best_loss"])
    # Checkpoints + observability artifacts exist.
    assert os.path.isdir(os.path.join(cfg.save_dir, "latest"))
    assert os.path.isdir(os.path.join(cfg.save_dir, "best"))
    assert os.path.exists(os.path.join(cfg.save_dir, "results.csv"))
    assert os.path.exists(os.path.join(cfg.save_dir, "plots", "combined_loss_curves.png"))
    assert os.path.isdir(os.path.join(cfg.save_dir, "visualizations"))
    logs = os.listdir(os.path.join(cfg.save_dir, "logs"))
    assert logs, "no log dir created"


def test_train_resume_continues(tiny_dataset, tmp_path):
    from retinex_tpu.train.trainer import train

    cfg = _tiny_config(tiny_dataset, str(tmp_path / "ckpt"), num_epochs=1)
    train(cfg)
    cfg2 = _tiny_config(
        tiny_dataset,
        str(tmp_path / "ckpt"),
        num_epochs=2,
        resume=os.path.join(str(tmp_path / "ckpt"), "latest"),
    )
    result = train(cfg2)
    assert result["epochs_run"] == 2  # resumed at epoch 1, ran epoch 1 only


def test_loss_decreases_over_short_run(tiny_dataset, tmp_path):
    import csv

    from retinex_tpu.train.trainer import train

    cfg = _tiny_config(
        tiny_dataset, str(tmp_path / "ckpt"), num_epochs=4, lr=2e-3
    )
    train(cfg)
    with open(os.path.join(cfg.save_dir, "results.csv")) as f:
        rows = list(csv.DictReader(f))
    totals = [float(r["total"]) for r in rows]
    assert len(totals) == 4
    assert totals[-1] < totals[0], totals
