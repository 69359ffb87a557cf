"""Visualization + observability utilities."""

import json
import os

import numpy as np

from retinex_tpu.utils.logging import MetricLogger, save_loss_curves, save_results_to_csv
from retinex_tpu.utils.viz import create_comparison, create_gif, save_image, visualize_results


def test_save_image_rgb_and_gray(tmp_path, rng):
    img = rng.random((16, 20, 3)).astype(np.float32)
    save_image(img, str(tmp_path / "rgb.png"))
    save_image(img[..., :1], str(tmp_path / "gray.png"))
    from PIL import Image

    assert Image.open(tmp_path / "rgb.png").size == (20, 16)
    assert Image.open(tmp_path / "gray.png").mode == "RGB"


def test_create_comparison_panels(tmp_path, rng):
    low = rng.random((16, 20, 3)).astype(np.float32)
    enh = rng.random((16, 20, 3)).astype(np.float32)
    illu = rng.random((16, 20, 1)).astype(np.float32)
    strip2 = create_comparison(low, enh, save_path=str(tmp_path / "c2.png"))
    assert strip2.shape == (16, 40, 3)
    strip3 = create_comparison(low, enh, illu, save_path=str(tmp_path / "c3.png"))
    assert strip3.shape == (16, 60, 3)
    assert os.path.exists(tmp_path / "c2.png")


def test_visualize_results(tmp_path, rng):
    low = rng.random((1, 16, 20, 3)).astype(np.float32)
    visualize_results(low, low, low[..., :1], save_path=str(tmp_path / "viz.png"))
    assert os.path.exists(tmp_path / "viz.png")


def test_create_gif(tmp_path, rng):
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        save_image(rng.random((8, 8, 3)).astype(np.float32), p)
        paths.append(p)
    create_gif(paths, str(tmp_path / "anim.gif"), duration=100)
    from PIL import Image

    gif = Image.open(tmp_path / "anim.gif")
    assert gif.n_frames == 3


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path / "logs"))
    logger.add_scalar("Loss/total", 1.5, 0)
    logger.add_scalars("Epoch_Loss", {"total": 1.2, "color": 0.1}, 1)
    logger.close()
    lines = open(tmp_path / "logs" / "metrics.jsonl").read().strip().splitlines()
    records = [json.loads(l) for l in lines]
    assert {r["tag"] for r in records} == {"Loss/total", "Epoch_Loss/total", "Epoch_Loss/color"}
    # TensorBoard event file written too (tensorboardX available here).
    assert any(f.startswith("events") for f in os.listdir(tmp_path / "logs"))


def test_loss_curves_and_csv(tmp_path):
    history = {"total": [3.0, 2.0, 1.0], "color": [0.3, 0.2, 0.1]}
    save_loss_curves(history, str(tmp_path))
    assert os.path.exists(tmp_path / "plots" / "total_curve.png")
    assert os.path.exists(tmp_path / "plots" / "combined_loss_curves.png")
    csv_path = save_results_to_csv(history, str(tmp_path))
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0] == "epoch,total,color"
    assert len(rows) == 4
