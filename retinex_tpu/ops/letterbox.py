"""YOLO-style letterbox preprocessing, TPU-native.

Reimplements the reference's letterbox (utils/letterbox.py:9-62) and
letterbox_tensor (:65-102) with a static-shape split that suits XLA: the
geometry (resize dims + pads) is computed host-side in Python from static
shapes (`plan_letterbox`), and the device op (`letterbox`) is a pure jnp
function jittable with that static plan.

The reference's tensor wrapper round-trips through uint8 (utils/letterbox.py:92-100),
quantizing the image to 8 bits mid-pipeline; `quantize_u8=True` reproduces that.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from retinex_tpu.ops.resize import resize_bilinear, resize_u8_round

GRAY = 114.0 / 255.0  # padding color (reference: utils/letterbox.py:9 color=(114,114,114))


@dataclasses.dataclass(frozen=True)
class LetterboxPlan:
    """Static letterbox geometry: everything jit needs to know at trace time."""

    in_h: int
    in_w: int
    resize_h: int
    resize_w: int
    pad_top: int
    pad_bottom: int
    pad_left: int
    pad_right: int
    ratio: tuple[float, float]  # (width_ratio, height_ratio)
    dwdh: tuple[float, float]  # half-paddings (dw, dh) as the reference returns

    @property
    def out_h(self) -> int:
        return self.resize_h + self.pad_top + self.pad_bottom

    @property
    def out_w(self) -> int:
        return self.resize_w + self.pad_left + self.pad_right


def plan_letterbox(
    in_h: int,
    in_w: int,
    new_shape: int | tuple[int, int],
    auto: bool = True,
    scale_fill: bool = False,
    scaleup: bool = True,
    stride: int = 32,
) -> LetterboxPlan:
    """Compute letterbox geometry (reference: utils/letterbox.py:27-60).

    auto=True pads only up to multiple-of-`stride` alignment (the net
    downsamples 8x; the reference uses 32), not to the full target square.
    """
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / in_h, new_shape[1] / in_w)
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad_w, new_unpad_h = int(round(in_w * r)), int(round(in_h * r))
    dw = new_shape[1] - new_unpad_w
    dh = new_shape[0] - new_unpad_h
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0, 0
        new_unpad_w, new_unpad_h = new_shape[1], new_shape[0]
        ratio = (new_shape[1] / in_w, new_shape[0] / in_h)
    dw_half, dh_half = dw / 2.0, dh / 2.0
    top, bottom = int(round(dh_half - 0.1)), int(round(dh_half + 0.1))
    left, right = int(round(dw_half - 0.1)), int(round(dw_half + 0.1))
    return LetterboxPlan(
        in_h=in_h,
        in_w=in_w,
        resize_h=new_unpad_h,
        resize_w=new_unpad_w,
        pad_top=top,
        pad_bottom=bottom,
        pad_left=left,
        pad_right=right,
        ratio=ratio,
        dwdh=(dw_half, dh_half),
    )


def letterbox(x: jnp.ndarray, plan: LetterboxPlan, quantize_u8: bool = True) -> jnp.ndarray:
    """Apply a letterbox plan to float [0,1] NHWC (or HWC) images on device.

    quantize_u8=True reproduces the reference's uint8 round-trip
    (utils/letterbox.py:92-100); False keeps full float precision.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if (plan.resize_h, plan.resize_w) != (x.shape[1], x.shape[2]):
        if quantize_u8:
            x = resize_u8_round(x, plan.resize_h, plan.resize_w)
        else:
            x = resize_bilinear(x, plan.resize_h, plan.resize_w)
    elif quantize_u8:
        x = jnp.round(x * 255.0) / 255.0
    x = jnp.pad(
        x,
        ((0, 0), (plan.pad_top, plan.pad_bottom), (plan.pad_left, plan.pad_right), (0, 0)),
        constant_values=GRAY,
    )
    return x[0] if squeeze else x


def letterbox_np(img: np.ndarray, plan: LetterboxPlan) -> np.ndarray:
    """Host-side letterbox on uint8 HWC numpy (data pipeline path).

    Uses a float bilinear resize with half-pixel centers + round, matching
    cv2.resize INTER_LINEAR within its fixed-point rounding (±1 LSB).
    """
    if (plan.resize_h, plan.resize_w) != img.shape[:2]:
        img = _resize_bilinear_np_u8(img, plan.resize_h, plan.resize_w)
    out = np.full((plan.out_h, plan.out_w, img.shape[2]), 114, dtype=np.uint8)
    out[plan.pad_top : plan.pad_top + plan.resize_h, plan.pad_left : plan.pad_left + plan.resize_w] = img
    return out


def _resize_bilinear_np_u8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    in_h, in_w = img.shape[:2]
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (in_h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (in_w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, in_w - 1)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
