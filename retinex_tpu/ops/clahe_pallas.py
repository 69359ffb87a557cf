"""Fused Mosaic/Pallas CLAHE: Lab colorspace + tile histograms + LUT apply,
with the one-hot algebra resident in VMEM.

Layout strategy: the image is cellized ONCE in XLA to half-tile cells
[B, ncy, ncx, 3, P] (P = cell pixels on the lane axis; channels lead), and all
kernels consume/produce that layout — so the only HBM glue is one cellize of
the input and one de-cellize of the output.

- `_hist_kernel` — grid (B, tiles_y, tiles_x), block = one tile's 2x2 cells:
  sRGB de-gamma -> XYZ -> Lab (8-bit scale) in-register, quantize, nibble
  one-hot transposes [16, P] in VMEM, tile histogram as four [16,P]x[P,16] MXU
  contractions (one per cell). Emits Lab cells + histograms.
- `_apply_kernel` — grid (B, ncy, ncx/GROUP), block = GROUP consecutive cells:
  per cell, evaluate the 4 neighbour LUTs as lutT @ hi_ohT MXU dots + a
  lo-nibble row-dot, blend with the static (parity, offset) weights, then
  inverse Lab -> RGB in-register. GROUP cells per program amortizes the
  per-program DMA/setup cost.

The LUT build between them (clip/redistribute/CDF over [B,T,256]) stays in XLA.

Bit-compatible with ops/clahe_fast (and cv2) within float .5-tie rounding.
Requires H % (2*tiles_y) == 0 and W % (2*tiles_x) == 0; callers fall back to
clahe_fast upstream for other shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retinex_tpu.ops.clahe import HIST_SIZE
from retinex_tpu.ops.clahe_fast import _luts_from_hist, _neighbor_index_tables

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


def _nibble_onehots_t(v_int, p, dtype=jnp.bfloat16):
    iota = jax.lax.broadcasted_iota(jnp.int32, (16, p), 0)
    hi_t = ((v_int >> 4)[None, :] == iota).astype(dtype)
    lo_t = ((v_int & 15)[None, :] == iota).astype(dtype)
    return hi_t, lo_t


def _hist_kernel(rgb_ref, lab_ref, hist_ref):
    """rgb_ref: [2, 2, 3, P] f32 (one tile's 4 cells, u8-quantized [0,1]);
    lab_ref out: [2, 2, 3, P] f32 (8-bit-scale, u8-rounded);
    hist_ref out: [16, 16] f32 (the tile histogram)."""
    p = rgb_ref.shape[-1]
    hist = jnp.zeros((16, 16), jnp.float32)
    for qy in range(2):
        for qx in range(2):
            r = rgb_ref[qy, qx, 0, :]
            g = rgb_ref[qy, qx, 1, :]
            b = rgb_ref[qy, qx, 2, :]
            L8, a8, b8 = _rgb_to_lab_u8scale(r, g, b)
            Lq = jnp.clip(jnp.round(L8), 0.0, 255.0)
            lab_ref[qy, qx, 0, :] = Lq
            lab_ref[qy, qx, 1, :] = jnp.clip(jnp.round(a8), 0.0, 255.0)
            lab_ref[qy, qx, 2, :] = jnp.clip(jnp.round(b8), 0.0, 255.0)
            hi_t, lo_t = _nibble_onehots_t(Lq.astype(jnp.int32), p)
            hist = hist + jax.lax.dot_general(
                hi_t,
                lo_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    hist_ref[:, :] = hist


def _apply_kernel(hh, hw, group, lab_ref, lut_ref, out_ref):
    """lab_ref: [group, 3, P] f32 Lab cells; lut_ref: [group, 4, 16, 16] f32;
    out_ref: [group, 3, P] f32 RGB. Grid: (B, ncy, ncx // group)."""
    p = hh * hw
    cy = pl.program_id(1)
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)[0]
    ux = (pix % hw).astype(jnp.float32)
    uy = (pix // hw).astype(jnp.float32)
    # Row parity is fixed for the program; column parity alternates with the
    # static in-group index k (group is even), so xa_even/xa_odd are static.
    ya_even = uy / (2.0 * hh) + 0.5
    ya_odd = uy / (2.0 * hh)
    ya = jnp.where(cy % 2 == 0, ya_even, ya_odd)
    xa_even = ux / (2.0 * hw) + 0.5
    xa_odd = ux / (2.0 * hw)

    for k in range(group):
        v = lab_ref[k, 0, :].astype(jnp.int32)
        hi_t, _ = _nibble_onehots_t(v, p)
        iota = jax.lax.broadcasted_iota(jnp.int32, (16, p), 0)
        lo_t = ((v & 15)[None, :] == iota).astype(jnp.float32)

        def eval_lut(idx):
            tT = jax.lax.dot_general(
                lut_ref[k, idx].astype(jnp.bfloat16),
                hi_t,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [16, P]
            return jnp.sum(tT * lo_t, axis=0)  # [P]

        l00 = eval_lut(0)
        l01 = eval_lut(1)
        l10 = eval_lut(2)
        l11 = eval_lut(3)

        xa = xa_even if k % 2 == 0 else xa_odd
        top = l00 * (1.0 - xa) + l01 * xa
        bot = l10 * (1.0 - xa) + l11 * xa
        L2 = jnp.clip(jnp.round(top * (1.0 - ya) + bot * ya), 0.0, 255.0)

        r, g, b = _lab_u8scale_to_rgb(L2, lab_ref[k, 1, :], lab_ref[k, 2, :])
        out_ref[k, 0, :] = jnp.round(r * 255.0) / 255.0
        out_ref[k, 1, :] = jnp.round(g * 255.0) / 255.0
        out_ref[k, 2, :] = jnp.round(b * 255.0) / 255.0


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
    p = hh * hw
    ncy, ncx = 2 * tiles_y, 2 * tiles_x
    group = 8 if ncx % 8 == 0 else (4 if ncx % 4 == 0 else 2 if ncx % 2 == 0 else 1)

    xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0

    # Single cellize: NHWC -> [B, ncy, ncx, 3, P] (channels lead, cell pixels
    # on the lane axis).
    cells = (
        xq.reshape(b, ncy, hh, ncx, hw, 3)
        .transpose(0, 1, 3, 5, 2, 4)
        .reshape(b, ncy, ncx, 3, p)
    )

    lab_cells, hist16 = pl.pallas_call(
        _hist_kernel,
        grid=(b, tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(
                (None, 2, 2, 3, p), lambda i, j, k: (i, j, k, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (None, 2, 2, 3, p), lambda i, j, k: (i, j, k, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, None, None, 16, 16),
                lambda i, j, k: (i, j, k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, ncy, ncx, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((b, tiles_y, tiles_x, 16, 16), jnp.float32),
        ),
        interpret=interpret,
    )(cells)

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

    rgb_cells = pl.pallas_call(
        functools.partial(_apply_kernel, hh, hw, group),
        grid=(b, ncy, ncx // group),
        in_specs=[
            pl.BlockSpec(
                (None, None, group, 3, p), lambda i, j, k: (i, j, k, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, None, group, 4, 16, 16),
                lambda i, j, k: (i, j, k, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, None, group, 3, p), lambda i, j, k: (i, j, k, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, ncy, ncx, 3, p), jnp.float32),
        interpret=interpret,
    )(lab_cells, lut4)

    out = (
        rgb_cells.reshape(b, ncy, ncx, 3, hh, hw)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(b, h, w, 3)
    )
    return out[0] if squeeze else out


