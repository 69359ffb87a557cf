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
