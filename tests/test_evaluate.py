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


def test_evaluate_mixed_shapes_and_small_batches(tmp_path, rng):
    """Two shape buckets, batch smaller than a bucket: every image still gets
    a row and values match the per-image metric bundle."""
    import jax.numpy as jnp

    from retinex_tpu.data.dataset import decode_image
    from retinex_tpu.ops.metrics import calculate_metrics

    d = tmp_path / "mixed"
    d.mkdir()
    for i in range(3):
        Image.fromarray((rng.random((32, 40, 3)) * 255).astype(np.uint8)).save(
            d / f"a_{i}.png"
        )
    for i in range(2):
        Image.fromarray((rng.random((24, 24, 3)) * 255).astype(np.uint8)).save(
            d / f"b_{i}.png"
        )
    rows = evaluate_directory(str(d), batch_size=2)
    assert len(rows) == 5
    by_name = {r["image"]: r for r in rows}
    img = jnp.asarray(decode_image(str(d / "a_1.png")), jnp.float32) / 255.0
    want = {k: float(v) for k, v in calculate_metrics(img).items()}
    got = by_name["a_1.png"]
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-5, err_msg=k)


def test_evaluate_sharded_matches_single(dirs):
    """Metrics sharded over an 8-device data mesh match the single-device
    run (multi-chip evaluate; padding rows are sliced off)."""
    from retinex_tpu.parallel.mesh import create_mesh

    a, b = dirs
    base = evaluate_directory(a, reference_dir=b)
    sharded = evaluate_directory(a, reference_dir=b, mesh=create_mesh(8))
    assert len(base) == len(sharded)
    for r1, r2 in zip(base, sharded):
        assert r1["image"] == r2["image"]
        for k in r1:
            if k != "image":
                np.testing.assert_allclose(r1[k], r2[k], rtol=1e-5, err_msg=k)
