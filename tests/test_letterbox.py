"""Golden tests: letterbox geometry + pixels vs the reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from retinex_tpu.ops.letterbox import letterbox, letterbox_np, plan_letterbox


@pytest.mark.parametrize(
    "in_hw,new_shape,auto,scaleup",
    [
        ((480, 640), 640, True, True),
        ((480, 640), 640, False, True),
        ((1024, 1024), 640, True, True),
        ((123, 457), 640, True, True),
        ((720, 1280), 640, True, False),
        ((1080, 1920), (1088, 1920), False, True),
        ((300, 200), 640, True, True),
    ],
)
def test_plan_matches_reference_geometry(reference_path, in_hw, new_shape, auto, scaleup):
    from utils.letterbox import letterbox as ref_letterbox

    img = np.zeros((*in_hw, 3), dtype=np.uint8)
    ref_img, ref_ratio, (ref_dw, ref_dh) = ref_letterbox(
        img, new_shape=new_shape, auto=auto, scaleup=scaleup
    )
    plan = plan_letterbox(in_hw[0], in_hw[1], new_shape, auto=auto, scaleup=scaleup)
    assert (plan.out_h, plan.out_w) == ref_img.shape[:2]
    assert plan.ratio == pytest.approx(ref_ratio)
    assert plan.dwdh == pytest.approx((ref_dw, ref_dh))


def test_letterbox_np_pixels_close_to_cv2(reference_path, rng):
    from utils.letterbox import letterbox as ref_letterbox

    img = rng.integers(0, 256, size=(123, 457, 3), dtype=np.uint8)
    ref_img, _, _ = ref_letterbox(img, new_shape=640, auto=True, scaleup=True)
    plan = plan_letterbox(123, 457, 640, auto=True, scaleup=True)
    got = letterbox_np(img, plan)
    assert got.shape == ref_img.shape
    diff = np.abs(got.astype(np.int32) - ref_img.astype(np.int32))
    # cv2.resize INTER_LINEAR uses 11-bit fixed point; ±1 LSB expected rarely.
    assert diff.max() <= 1, f"max diff {diff.max()}"
    # cv2's 11-bit fixed-point weights round .5 ties differently from the
    # float path; ~10% of pixels land on ties at this scale ratio.
    assert (diff > 0).mean() < 0.2


def test_letterbox_device_matches_host(rng):
    img = rng.integers(0, 256, size=(123, 457, 3), dtype=np.uint8)
    plan = plan_letterbox(123, 457, 640, auto=True, scaleup=True)
    host = letterbox_np(img, plan).astype(np.float32) / 255.0
    dev = np.asarray(letterbox(jnp.asarray(img, jnp.float32) / 255.0, plan, quantize_u8=True))
    diff = np.abs(host - dev) * 255.0
    assert diff.max() <= 1.01, f"max diff {diff.max()}"


def test_letterbox_pad_value():
    # 2:1 aspect into a square: left/right padding columns must be gray-114.
    plan = plan_letterbox(100, 50, 128, auto=False, scaleup=True)
    x = jnp.zeros((100, 50, 3), jnp.float32)
    out = np.asarray(letterbox(x, plan))
    assert out.shape == (128, 128, 3)
    assert plan.pad_left > 0
    assert np.allclose(out[:, 0], 114.0 / 255.0, atol=1e-6)
    assert np.allclose(out[:, -1], 114.0 / 255.0, atol=1e-6)
