"""Evaluation driver: metric bundles over a directory, with/without a paired
reference directory, CSV output."""

import os

import numpy as np
import pytest
from PIL import Image

from retinex_tpu.infer.evaluate import evaluate_directory


@pytest.fixture
def dirs(tmp_path, rng):
    a = tmp_path / "enhanced"
    b = tmp_path / "reference"
    a.mkdir()
    b.mkdir()
    for i in range(3):
        img = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
        ref = np.clip(img.astype(np.int32) + rng.integers(-10, 10, img.shape), 0, 255).astype(
            np.uint8
        )
        Image.fromarray(img).save(a / f"img_{i}.png")
        Image.fromarray(ref).save(b / f"img_{i}.png")
    return str(a), str(b)


def test_evaluate_no_reference(dirs):
    a, _ = dirs
    rows = evaluate_directory(a)
    assert len(rows) == 3
    for r in rows:
        for k in ("mean_brightness", "contrast", "entropy", "niqe", "saturation", "naturalness"):
            assert np.isfinite(r[k]), k
        assert "psnr" not in r


def test_evaluate_with_reference_and_csv(dirs, tmp_path):
    a, b = dirs
    csv_path = str(tmp_path / "out" / "metrics.csv")
    rows = evaluate_directory(a, reference_dir=b, output_csv=csv_path)
    assert all("psnr" in r and "ssim" in r and "mse" in r for r in rows)
    assert all(r["psnr"] > 20 for r in rows)  # +-10 u8 noise => ~28-30 dB
    assert os.path.exists(csv_path)
    header = open(csv_path).readline().strip().split(",")
    assert header[0] == "image" and "psnr" in header


def test_evaluate_empty_dir(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(ValueError):
        evaluate_directory(str(d))
