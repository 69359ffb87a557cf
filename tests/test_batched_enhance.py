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
