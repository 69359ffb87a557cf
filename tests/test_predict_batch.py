"""Batched predict driver: bucketed dispatch, byte-parity with the per-image
path, and mesh sharding (round-3: TPU-first predict, infer/predict.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from retinex_tpu.infer.predict import predict_batch, predict_single_image
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex


@pytest.fixture(scope="module")
def apply_fn():
    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )

    @jax.jit
    def fn(batch):
        return model.apply(variables, batch, train=False)

    return fn


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(3)
    d = tmp_path / "in"
    d.mkdir()
    # two canvas buckets
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (96, 64, 3), dtype=np.uint8)).save(
            d / f"tall_{i}.png"
        )
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
        d / "wide_0.png"
    )
    return d


def test_predict_batch_matches_single(apply_fn, image_dir, tmp_path):
    out_b = tmp_path / "batched"
    out_s = tmp_path / "single"
    timings = predict_batch(apply_fn, str(image_dir), str(out_b), batch_size=2)
    assert len(timings) == 4
    for f in os.listdir(image_dir):
        name = os.path.splitext(f)[0]
        for suffix in ("enhanced", "illumination", "comparison"):
            assert (out_b / f"{name}_{suffix}.png").exists(), f"{name}_{suffix}"

    predict_single_image(apply_fn, str(image_dir / "tall_1.png"), str(out_s))
    for suffix in ("enhanced", "illumination"):
        a = np.asarray(Image.open(out_b / f"tall_1_{suffix}.png"))
        b = np.asarray(Image.open(out_s / f"tall_1_{suffix}.png"))
        np.testing.assert_array_equal(a, b, err_msg=suffix)


def test_predict_batch_sharded_matches(apply_fn, image_dir, tmp_path):
    from retinex_tpu.parallel.mesh import create_mesh

    out_1 = tmp_path / "dev1"
    out_8 = tmp_path / "dev8"
    predict_batch(apply_fn, str(image_dir), str(out_1), batch_size=4)
    predict_batch(
        apply_fn, str(image_dir), str(out_8), batch_size=4, mesh=create_mesh(8)
    )
    for f in os.listdir(out_1):
        a = np.asarray(Image.open(out_1 / f))
        b = np.asarray(Image.open(out_8 / f))
        np.testing.assert_array_equal(a, b, err_msg=f)


def test_predict_spatial_shard_cli_matches(image_dir, tmp_path):
    """--spatial_shard predict (cli._build_apply_fn wiring) produces PNGs
    byte-identical to the standard single-device path."""
    from retinex_tpu.cli import _build_apply_fn
    from retinex_tpu.config import Config

    # 96x64 letterboxes to a /32 canvas whose H divides 8*8=64? 96 -> pads to
    # 96x96... use a 128-tall source so the canvas H is 128 (divisible by 64).
    rng = np.random.default_rng(7)
    src = image_dir / "big.png"
    Image.fromarray(rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)).save(src)

    cfg = dict(mode="predict", checkpoint="", packed_inference=False)
    fn_plain = _build_apply_fn(Config(**cfg), require_checkpoint=False)
    fn_spatial = _build_apply_fn(Config(**cfg, spatial_shard=True), require_checkpoint=False)

    out_p = tmp_path / "plain"
    out_s = tmp_path / "spatial"
    predict_single_image(fn_plain, str(src), str(out_p))
    predict_single_image(fn_spatial, str(src), str(out_s))
    for suffix in ("enhanced", "illumination"):
        a = np.asarray(Image.open(out_p / f"big_{suffix}.png"))
        b = np.asarray(Image.open(out_s / f"big_{suffix}.png"))
        np.testing.assert_array_equal(a, b, err_msg=suffix)


def test_predict_spatial_shard_directory(image_dir, tmp_path):
    """Regression (round-3 review): --spatial_shard over a DIRECTORY must not
    nest the spatial mesh inside the shard_map batch driver. The CLI now
    disables batch-sharding when spatial is active; the run must complete."""
    from retinex_tpu.cli import run
    from retinex_tpu.config import Config

    rng = np.random.default_rng(8)
    Image.fromarray(rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)).save(
        image_dir / "big2.png"
    )
    cfg = Config(
        mode="predict",
        checkpoint="",
        packed_inference=False,
        spatial_shard=True,
        input_path=str(image_dir),
        output_dir=str(tmp_path / "out"),
        no_comparison=True,
    )
    # monkeypatch-free: _build_apply_fn allows untrained weights only when
    # require_checkpoint=False, so drive predict_batch directly like run() does.
    from retinex_tpu.cli import _build_apply_fn

    apply_fn = _build_apply_fn(cfg, require_checkpoint=False)
    timings = predict_batch(
        apply_fn, str(image_dir), str(tmp_path / "out"), mesh=None, save_comparison=False
    )
    assert len(timings) == len(os.listdir(image_dir))
