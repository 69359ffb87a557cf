"""Bilinear resize with half-pixel centers (cv2 INTER_LINEAR / torch
align_corners=False semantics), NHWC, no antialiasing.

Replaces the reference's cv2.resize (utils/letterbox.py:58) and
F.interpolate(..., mode='bilinear', align_corners=False)
(models/model.py:421-431, enhancers/multi_scale.py:41-43).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) images to (out_h, out_w).

    Half-pixel source mapping src = (dst + 0.5) * (in/out) - 0.5 with edge
    clamping, no antialiasing — parity with cv2 INTER_LINEAR (float path) and
    torch F.interpolate(align_corners=False).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze else x
    if h % max(out_h, 1) == 0 and w % max(out_w, 1) == 0 and out_h and out_w:
        ry, rx = h // out_h, w // out_w
        if ry >= 1 and rx >= 1 and (ry > 1 or rx > 1):
            # Exact integer downscale: the half-pixel map src = k*d + (k-1)/2
            # hits either one source row (k odd, frac 0) or the midpoint of
            # two adjacent rows (k even, frac 0.5) — a strided slice / 2-row
            # mean instead of jax.image.resize's dense interpolation matmuls
            # (bit-identical up to FMA; covered by tests vs jax.image).
            out = _exact_down(_exact_down(x, ry, 1), rx, 2)
            return out[0] if squeeze else out
    out = jax.image.resize(x, (n, out_h, out_w, c), method="linear", antialias=False)
    return out[0] if squeeze else out


def _exact_down(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    if k == 1:
        return x
    shape = list(x.shape)
    out = shape[axis] // k
    grouped = x.reshape(*shape[:axis], out, k, *shape[axis + 1 :])

    def take(i):
        idx = tuple([slice(None)] * (axis + 1) + [i])
        return grouped[idx]

    if k % 2:
        return take((k - 1) // 2)
    return (take(k // 2 - 1) + take(k // 2)) * 0.5


def resize_scale(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Resize by scale factor with torch floor semantics: out = int(in * scale)
    (reference: enhancers/multi_scale.py:40, models/model.py:421-422 use
    F.interpolate(scale_factor=s) => floor(in*s))."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, int(h * scale), int(w * scale))


def resize_u8_round(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize a float image in [0,1], quantizing through uint8 like the
    reference letterbox does (utils/letterbox.py:92-100: tensor -> uint8 ->
    cv2.resize -> float). Rounds to the 1/255 grid before and after."""
    xq = jnp.round(x * 255.0)
    y = resize_bilinear(xq, out_h, out_w)
    return jnp.clip(jnp.round(y), 0.0, 255.0) / 255.0
