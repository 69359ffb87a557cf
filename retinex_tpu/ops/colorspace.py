"""Colorspace conversions as pure jnp functions (NHWC, float in [0,1] unless noted).

TPU-native replacements for the OpenCV color conversions the reference leans on
(reference: enhancers/adaptive_params.py:45-48,142-161; enhancers/content_aware.py:40-43;
enhancers/multi_scale.py:46-49; datasets/dataset.py:166-183).

All functions are elementwise/matmul-shaped so XLA fuses them into surrounding
graphs; nothing here materialises intermediates in HBM when jitted.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.601 luma weights (reference: enhancers/multi_scale.py:46-49 and
# datasets/dataset.py:166 use 0.299/0.587/0.114 on RGB).
_REC601 = jnp.asarray([0.299, 0.587, 0.114], dtype=jnp.float32)

# Linear RGB -> XYZ (D65), the matrix OpenCV uses for Lab. For 8-bit images
# OpenCV *does* apply sRGB de-gamma before this matrix (verified empirically
# against cv2 5.0: the no-gamma formula is off by up to 78 L-levels, the sRGB
# formula by <1).
_RGB2XYZ = jnp.asarray(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=jnp.float32,
)
_XYZ2RGB = jnp.asarray(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875992, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    dtype=jnp.float32,
)
_XN = 0.950456  # D65 white point (X), OpenCV constant
_ZN = 1.088754  # D65 white point (Z), OpenCV constant


def rgb_to_luma(x: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 luma. x: [..., 3] in [0,1] -> [..., 1]."""
    return jnp.sum(x * _REC601.astype(x.dtype), axis=-1, keepdims=True)


def rgb_to_gray_mean(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-mean gray (the reference model/losses use plain mean over RGB,
    reference: models/model.py:354, losses/loss.py:41-42). x: [..., 3] -> [..., 1]."""
    return jnp.mean(x, axis=-1, keepdims=True)


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB electro-optical transfer: de-gamma to linear light."""
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`srgb_to_linear` (gamma encode)."""
    x = jnp.maximum(x, 0.0)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1.0 / 2.4) - 0.055)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    # CIE f(t): cube root above the linear-domain threshold, affine below.
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _lab_f_inv(ft: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(ft > 6.0 / 29.0, ft**3, (ft - 16.0 / 116.0) / 7.787)


def rgb_to_lab_u8(x: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] float -> OpenCV-style 8-bit-scaled Lab floats.

    Matches cv2.cvtColor(img_u8, COLOR_RGB2LAB) semantics: sRGB de-gamma, the
    D65 XYZ matrix, CIE f(), then 8-bit channel scaling: L in [0,255]
    (=L*100 scaled by 255/100), a,b offset by +128
    (reference use: enhancers/adaptive_params.py:142-148).

    Returns float (not uint8) so the caller controls rounding; round+clip to
    recover exact cv2 uint8 values (±1 from cv2's fixed-point LUTs).
    """
    x = srgb_to_linear(x.astype(jnp.float32))
    # Explicit multiply-adds, NOT a matmul: matmul units (MXU on TPU, oneDNN on
    # CPU) run 3x3 color transforms at reduced internal precision, which is
    # visible after the cbrt/x500 amplification below.
    r, g, b_ = x[..., 0], x[..., 1], x[..., 2]
    m = _RGB2XYZ
    X = (m[0, 0] * r + m[0, 1] * g + m[0, 2] * b_) / _XN
    Y = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b_
    Z = (m[2, 0] * r + m[2, 1] * g + m[2, 2] * b_) / _ZN
    fx, fy, fz = _lab_f(X), _lab_f(Y), _lab_f(Z)
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    L8 = L * (255.0 / 100.0)
    return jnp.stack([L8, a + 128.0, b + 128.0], axis=-1)


def lab_u8_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb_to_lab_u8`. lab channels in 8-bit scale -> RGB [0,1]."""
    lab = lab.astype(jnp.float32)
    L = lab[..., 0] * (100.0 / 255.0)
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    Y = _lab_f_inv(fy)
    X = _lab_f_inv(fx) * _XN
    Z = _lab_f_inv(fz) * _ZN
    m = _XYZ2RGB
    rgb = jnp.stack(
        [
            m[0, 0] * X + m[0, 1] * Y + m[0, 2] * Z,
            m[1, 0] * X + m[1, 1] * Y + m[1, 2] * Z,
            m[2, 0] * X + m[2, 1] * Y + m[2, 2] * Z,
        ],
        axis=-1,
    )
    return jnp.clip(linear_to_srgb(rgb), 0.0, 1.0)


def adjust_saturation(x: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """Blend toward Rec.601 gray: gray + factor*(x-gray), clipped to [0,1]
    (reference: datasets/dataset.py:160-183)."""
    gray = rgb_to_luma(x)
    return jnp.clip(gray + factor * (x - gray), 0.0, 1.0)


def saturation_map(x: jnp.ndarray) -> jnp.ndarray:
    """HSV-style saturation (max-min)/max per pixel, 0 where max ~ 0
    (reference: utils/utils.py:281-303). x: [..., 3] -> [...]."""
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    return jnp.where(mx > 1e-8, (mx - mn) / jnp.maximum(mx, 1e-8), 0.0)
