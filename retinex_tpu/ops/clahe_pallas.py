"""Fused Mosaic/Pallas CLAHE: Lab colorspace + tile histograms + LUT apply,
with all one-hot algebra resident in VMEM.

Two kernels over pre-cellized planar layouts (the only HBM traffic is the
image itself plus uint8-scale Lab planes):

- `_hist_kernel` — grid (B, tiles): RGB tile -> sRGB de-gamma -> XYZ -> Lab
  (8-bit scale), quantize, nibble one-hot transposes [16, area] in VMEM, tile
  histogram as ONE [16,area]x[area,16] MXU contraction. Emits Lab planes +
  histograms.
- `_apply_kernel` — grid (B, cells): per half-tile cell, evaluate the 4
  neighbour LUTs as lutT @ hi_ohT MXU dots + lo-nibble row-dots, bilinearly
  blend with the static (parity, offset) weight tables, then inverse Lab ->
  RGB in-register.

The LUT build between them (clip/redistribute/CDF over [B,T,256]) is a few KB
of work and stays in XLA.

Bit-compatible with ops/clahe_fast (and cv2 within float-tie rounding).
Requires H % (2*tiles_y) == 0 and W % (2*tiles_x) == 0; other shapes raise
(callers fall back to clahe_fast/clahe_u8 upstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retinex_tpu.ops.clahe import HIST_SIZE
from retinex_tpu.ops.clahe_fast import (
    _blend_weights,
    _luts_from_hist,
    _neighbor_index_tables,
)

# D65 constants matching ops/colorspace.py (OpenCV 8-bit Lab parity).
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_XYZ2RGB = (
    (3.240479, -1.537150, -0.498535),
    (-0.969256, 1.875992, 0.041556),
    (0.055648, -0.204043, 1.057311),
)
_XN = 0.950456
_ZN = 1.088754


def _srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(x):
    x = jnp.maximum(x, 0.0)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1.0 / 2.4) - 0.055)


def _lab_f(t):
    # Mosaic has no cbrt primitive; t is only cube-rooted on the branch where
    # t > 0.008856, so the pow form is safe and matches to ~1 ulp.
    cuberoot = jnp.power(jnp.maximum(t, 1e-12), 1.0 / 3.0)
    return jnp.where(t > 0.008856, cuberoot, 7.787 * t + 16.0 / 116.0)


def _lab_f_inv(ft):
    return jnp.where(ft > 6.0 / 29.0, ft**3, (ft - 16.0 / 116.0) / 7.787)


def _rgb_to_lab_u8scale(r, g, b):
    """float [0,1] channels (already u8-quantized upstream) -> Lab floats in
    8-bit scale. Mirrors ops/colorspace.rgb_to_lab_u8."""
    rl, gl, bl = _srgb_to_linear(r), _srgb_to_linear(g), _srgb_to_linear(b)
    m = _RGB2XYZ
    X = (m[0][0] * rl + m[0][1] * gl + m[0][2] * bl) / _XN
    Y = m[1][0] * rl + m[1][1] * gl + m[1][2] * bl
    Z = (m[2][0] * rl + m[2][1] * gl + m[2][2] * bl) / _ZN
    fx, fy, fz = _lab_f(X), _lab_f(Y), _lab_f(Z)
    L8 = (116.0 * fy - 16.0) * (255.0 / 100.0)
    a8 = 500.0 * (fx - fy) + 128.0
    b8 = 200.0 * (fy - fz) + 128.0
    return L8, a8, b8


def _lab_u8scale_to_rgb(L8, a8, b8):
    L = L8 * (100.0 / 255.0)
    a = a8 - 128.0
    b = b8 - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    Y = _lab_f_inv(fy)
    X = _lab_f_inv(fx) * _XN
    Z = _lab_f_inv(fz) * _ZN
    m = _XYZ2RGB
    r = _linear_to_srgb(m[0][0] * X + m[0][1] * Y + m[0][2] * Z)
    g = _linear_to_srgb(m[1][0] * X + m[1][1] * Y + m[1][2] * Z)
    b_ = _linear_to_srgb(m[2][0] * X + m[2][1] * Y + m[2][2] * Z)
    clip = lambda v: jnp.clip(v, 0.0, 1.0)  # noqa: E731
    return clip(r), clip(g), clip(b_)


def _hist_kernel(rgb_ref, lab_ref, hist_ref):
    """rgb_ref: [3, area] f32 (u8-quantized [0,1]); lab_ref out [3, area] f32
    (8-bit-scale, u8-rounded); hist_ref out [16, 16] f32."""
    r = rgb_ref[0, :]
    g = rgb_ref[1, :]
    b = rgb_ref[2, :]
    L8, a8, b8 = _rgb_to_lab_u8scale(r, g, b)
    Lq = jnp.clip(jnp.round(L8), 0.0, 255.0)
    lab_ref[0, :] = Lq
    lab_ref[1, :] = jnp.clip(jnp.round(a8), 0.0, 255.0)
    lab_ref[2, :] = jnp.clip(jnp.round(b8), 0.0, 255.0)

    v = Lq.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (16, v.shape[-1]), 0)
    hi_t = ((v >> 4)[None, :] == iota).astype(jnp.bfloat16)  # [16, area]
    lo_t = ((v & 15)[None, :] == iota).astype(jnp.bfloat16)
    hist_ref[:, :] = jax.lax.dot_general(
        hi_t,
        lo_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _apply_kernel(hh, hw, lab_ref, lut_ref, out_ref):
    """lab_ref: [3, P] f32 Lab cell (P = hh*hw); lut_ref: [4, 16, 16] f32;
    out_ref: [3, P] f32 RGB. Grid: (B, ncy, ncx)."""
    p = hh * hw
    v = lab_ref[0, :].astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (16, p), 0)
    hi_t = ((v >> 4)[None, :] == iota).astype(jnp.bfloat16)  # [16, P]
    lo_t = ((v & 15)[None, :] == iota).astype(jnp.float32)

    def eval_lut(k):
        # t^T[j, p] = sum_i lut[i, j] * hi_t[i, p]
        tT = jax.lax.dot_general(
            lut_ref[k].astype(jnp.bfloat16),
            hi_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [16, P]
        return jnp.sum(tT * lo_t, axis=0)  # [P]

    l00 = eval_lut(0)
    l01 = eval_lut(1)
    l10 = eval_lut(2)
    l11 = eval_lut(3)

    # Blend weights from (cell parity, offset) — identical float math to
    # clahe_fast._blend_weights.
    cy = pl.program_id(1)
    cx = pl.program_id(2)
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)[0]
    ux = (pix % hw).astype(jnp.float32)
    uy = (pix // hw).astype(jnp.float32)
    xa = jnp.where(cx % 2 == 0, ux / (2.0 * hw) + 0.5, ux / (2.0 * hw))
    ya = jnp.where(cy % 2 == 0, uy / (2.0 * hh) + 0.5, uy / (2.0 * hh))

    top = l00 * (1.0 - xa) + l01 * xa
    bot = l10 * (1.0 - xa) + l11 * xa
    L2 = jnp.clip(jnp.round(top * (1.0 - ya) + bot * ya), 0.0, 255.0)

    r, g, b = _lab_u8scale_to_rgb(L2, lab_ref[1, :], lab_ref[2, :])
    # Final u8 quantization like clahe_lab_rgb's round(rgb*255)/255.
    out_ref[0, :] = jnp.round(r * 255.0) / 255.0
    out_ref[1, :] = jnp.round(g * 255.0) / 255.0
    out_ref[2, :] = jnp.round(b * 255.0) / 255.0


@functools.partial(
    jax.jit, static_argnames=("clip_limit", "tiles_x", "tiles_y", "interpret")
)
def clahe_lab_rgb_pallas(
    x: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Lab-CLAHE pipeline. x: NHWC (or HWC) float [0,1] RGB."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, _ = x.shape
    if h % (2 * tiles_y) != 0 or w % (2 * tiles_x) != 0:
        raise ValueError(f"shape {(h, w)} not divisible by 2x tile grid")
    th, tw = h // tiles_y, w // tiles_x
    hh, hw = th // 2, tw // 2
    area = th * tw
    ncy, ncx = 2 * tiles_y, 2 * tiles_x
    n_tiles = tiles_y * tiles_x

    xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0

    # Cellize to tile-planar [B, T, 3, area]: channels lead each tile so the
    # kernels see [3, area] blocks with `area` on the lane axis.
    tiles = (
        xq.reshape(b, tiles_y, th, tiles_x, tw, 3)
        .transpose(0, 1, 3, 5, 2, 4)
        .reshape(b, n_tiles, 3, area)
    )

    lab_tiles, hist16 = pl.pallas_call(
        _hist_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((None, None, 3, area), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, None, 3, area), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 16, 16), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_tiles, 3, area), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, 16, 16), jnp.float32),
        ),
        interpret=interpret,
    )(tiles)

    hist = hist16.reshape(b, tiles_y, tiles_x, HIST_SIZE).astype(jnp.int32)
    luts = _luts_from_hist(hist, clip_limit, area).astype(jnp.float32)
    luts16 = luts.reshape(b, tiles_y, tiles_x, 16, 16)

    t0y, t1y = _neighbor_index_tables(tiles_y)
    t0x, t1x = _neighbor_index_tables(tiles_x)
    lut4 = jnp.stack(
        [
            luts16[:, t0y][:, :, t0x],
            luts16[:, t0y][:, :, t1x],
            luts16[:, t1y][:, :, t0x],
            luts16[:, t1y][:, :, t1x],
        ],
        axis=3,
    )  # [b, ncy, ncx, 4, 16, 16]

    # Re-cellize Lab from tile-planar to half-tile cells [B, ncy, ncx, 3, P].
    lab_cells = (
        lab_tiles.reshape(b, tiles_y, tiles_x, 3, 2, hh, 2, hw)
        .transpose(0, 1, 4, 2, 6, 3, 5, 7)
        .reshape(b, ncy, ncx, 3, hh * hw)
    )

    rgb_cells = pl.pallas_call(
        functools.partial(_apply_kernel, hh, hw),
        grid=(b, ncy, ncx),
        in_specs=[
            pl.BlockSpec(
                (None, None, None, 3, hh * hw), lambda i, j, k: (i, j, k, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, None, None, 4, 16, 16), lambda i, j, k: (i, j, k, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, None, None, 3, hh * hw), lambda i, j, k: (i, j, k, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, ncy, ncx, 3, hh * hw), jnp.float32),
        interpret=interpret,
    )(lab_cells, lut4)

    out = (
        rgb_cells.reshape(b, ncy, ncx, 3, hh, hw)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(b, h, w, 3)
    )
    return out[0] if squeeze else out


def clahe_u8_pallas(img_u8, clip_limit: float = 2.0, tiles_x: int = 8, tiles_y: int = 8):
    """CLAHE on uint8-valued [B,H,W] (or [H,W]) arrays (L-channel only).

    Routes to the MXU nibble-decomposition XLA path; the fused Pallas pipeline
    (clahe_lab_rgb_pallas) covers the full Lab round trip.
    """
    from retinex_tpu.ops.clahe_fast import clahe_u8_fast

    return clahe_u8_fast(img_u8, clip_limit=clip_limit, tiles_x=tiles_x, tiles_y=tiles_y)
