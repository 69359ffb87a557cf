"""Native C++ loader: pixel parity with the Python path and batch throughput."""

import numpy as np
import pytest
from PIL import Image

from retinex_tpu.data.native_loader import decode_letterbox_batch, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib not built")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory, ):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w, fmt) in enumerate([(80, 100, "PNG"), (123, 77, "JPEG"), (64, 64, "PNG")]):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        p = d / f"img_{i}.{'png' if fmt == 'PNG' else 'jpg'}"
        Image.fromarray(img).save(p, format=fmt, quality=95)
        paths.append(str(p))
    return paths


def test_native_matches_python_path(image_files):
    from retinex_tpu.data.dataset import decode_image
    from retinex_tpu.ops.letterbox import letterbox_np, plan_letterbox

    size = 96
    batch = decode_letterbox_batch(image_files, size, auto_pad=False, scaleup=True)
    assert batch.shape == (3, size, size, 3)
    for i, path in enumerate(image_files):
        img = decode_image(path)
        plan = plan_letterbox(img.shape[0], img.shape[1], size, auto=False, scaleup=True)
        want = letterbox_np(img, plan)
        diff = np.abs(batch[i].astype(np.int32) - want.astype(np.int32))
        # Identical resize math; PIL vs libjpeg DCT rounding can differ ±1 on
        # JPEG sources.
        assert diff.max() <= 1, f"image {i}: max diff {diff.max()}"


def test_native_missing_file_gray_fill(image_files, tmp_path):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        batch = decode_letterbox_batch(
            [image_files[0], str(tmp_path / "nope.jpg")], 64, auto_pad=False
        )
    assert (batch[1] == 114).all()
    assert not (batch[0] == 114).all()


def test_train_loader_uses_native(image_files, tmp_path):
    import os
    import shutil

    d = tmp_path / "train"
    d.mkdir()
    for p in image_files:
        shutil.copy(p, d / os.path.basename(p))
    from retinex_tpu.data.dataset import get_train_loader

    loader = get_train_loader(str(d), batch_size=3, image_size=64, num_workers=2)
    it = iter(loader)
    assert getattr(it, "use_native", False) is True
    batch = next(it)
    assert batch.shape == (3, 64, 64, 3)
    assert batch.dtype == np.uint8


def test_encode_png_roundtrip(tmp_path):
    from retinex_tpu.data.native_loader import encode_png

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
    path = tmp_path / "out.png"
    assert encode_png(img, str(path))
    back = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_encode_png_concurrent_mixed_sizes(tmp_path):
    # The production save path: N independently-sized per-image encodes on a
    # Python thread pool (ctypes releases the GIL during rtx_encode_png).
    from concurrent.futures import ThreadPoolExecutor

    from retinex_tpu.data.native_loader import encode_png

    rng = np.random.default_rng(6)
    images = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for h, w in [(40, 60), (100, 30), (64, 64), (33, 129)]
    ]
    paths = [str(tmp_path / f"b{i}.png") for i in range(len(images))]
    with ThreadPoolExecutor(max_workers=4) as pool:
        assert all(pool.map(encode_png, images, paths))
    for img, p in zip(images, paths):
        np.testing.assert_array_equal(np.asarray(Image.open(p).convert("RGB")), img)


def test_encode_png_rejects_bad_input(tmp_path):
    from retinex_tpu.data.native_loader import encode_png

    # wrong dtype / channels -> False (caller falls back to PIL)
    assert not encode_png(np.zeros((8, 8, 3), np.float32), str(tmp_path / "x.png"))
    assert not encode_png(np.zeros((8, 8, 4), np.uint8), str(tmp_path / "y.png"))
    # unwritable directory -> False, no crash
    assert not encode_png(
        np.zeros((8, 8, 3), np.uint8), str(tmp_path / "missing_dir" / "z.png")
    )


def test_save_image_uses_native_and_matches_pil(tmp_path):
    """utils.viz.save_image through the native encoder is pixel-identical to
    the PIL path (same float->u8 truncation, lossless PNG)."""
    from PIL import Image as PILImage

    from retinex_tpu.utils.viz import save_image

    rng = np.random.default_rng(7)
    img = rng.random((50, 80, 3)).astype(np.float32)
    p_native = tmp_path / "native.png"
    save_image(img, str(p_native))
    expected = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(PILImage.open(p_native)), expected)
