"""Gather-based CLAHE apply: Mosaic same-shape lane gathers replace one-hot algebra.

The XLA nibble-MXU apply stage (ops/clahe_fast.py) evaluates each 256-entry
tile LUT as ~272 MACs/pixel of dense one-hot contractions — VPU
speed-of-light for that algorithm is ~5 ms per 8-frame 1080p batch. Mosaic
supports `jnp.take_along_axis` when table and index shapes MATCH, and a
same-shape lane gather costs ~1 VPU op: a full 256-LUT lookup measures ~0.3 ms
for the whole batch (scripts/probe_gather3.py).

Architecture (v3 — no cellize: XLA relayout glue measured 6 ms/batch in v1):

- `_fwd_stage` (Pallas, grid (B, ncy/nb)): planar uint8 sRGB -> 8-bit Lab,
  nb half-tile row bands per program; sRGB de-gamma via same-shape lane
  gathers from a 2x128 table, cbrt via the Newton `_fast_cbrt`.
- `_tables_stage`: nibble-MXU per-tile histograms (int8 one-hot dot in XLA,
  direct cell-view contraction — no tile transpose), then ONE fused Pallas
  program per image (`_tables_kernel`) for the OpenCV clip/redistribute,
  CDF as one triangular-matrix dot, per-cell neighbour-LUT selection as a
  constant selection matmul, byte-packed into one int32 word per entry
  (the 4 neighbour LUTs are always indexed by the same pixel value) laid
  out as two 128-entry lane halves per cell.
- `_apply_stage` (Pallas, grid (B, ncy/nb)): within a band the y-neighbour
  tiles and the ya parity are fixed (nb even keeps parity static per
  unrolled band); a pixel looks up its packed word with 2 same-shape lane
  gathers + 1 half select, unpacks the 4 bytes, then runs the bilinear blend
  and the inverse Lab->RGB colorspace (gamma via `_fast_cbrt`) — one pass
  over the band. `optimization_barrier`s keep XLA from interleaving the
  table computation into the kernels' schedules.

Bit-compatible with ops/clahe_fast.clahe_u8_fast up to FMA formation (rare
+-1 at exact .5 blend ties) and the apply kernel's gamma-poly rounding ties
(~1.3e-3 of pixels on adversarial random dark images, far fewer on photos;
the 3-step `_fast_cbrt` makes the forward Lab math tie-free — PARITY.md
#19); the XLA path itself sits within +-1 of cv2's fixed-point pipeline
(tests/test_clahe.py).

Reference behavior reproduced: enhancers/adaptive_params.py:121-169
(cv2 Lab CLAHE on the L channel, clip 2.0, 8x8 tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retinex_tpu.ops.clahe import HIST_SIZE
from retinex_tpu.ops.clahe_fast import _blend_weights, _luts_from_hist, _neighbor_index_tables
from retinex_tpu.ops.colorspace import srgb_to_linear

# D65 constants matching ops/colorspace.py (python tuples: jnp-array constants
# can't be captured by Pallas kernels).
_RGB2XYZ_T = (
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
# XN / ZN folded into the matrix columns (fast-math path: saves two muls/px).
_XYZ2RGB_SCALED = tuple(
    (row[0] * _XN, row[1], row[2] * _ZN) for row in _XYZ2RGB
)
# 1/XN and 1/ZN folded into the FORWARD matrix rows (fast-math path: removes
# the two divisions/px — Mosaic f32 division is a multi-pass VPU op while the
# fold is free; constants are formed in python doubles).
_RGB2XYZ_T_SCALED = tuple(
    tuple(v / s for v in row)
    for row, s in zip(_RGB2XYZ_T, (_XN, 1.0, _ZN))
)


def _lab_f_inv(ft):
    # ft**3 (not ft*ft*ft): matches ops/colorspace._lab_f_inv.
    return jnp.where(ft > 6.0 / 29.0, ft**3, (ft - 16.0 / 116.0) / 7.787)


def _lab_f_inv_fast(ft):
    # Division-free variant for the fastmath kernels (ulp-level divergence
    # from the XLA path, inside the PARITY #19 fast-math class).
    return jnp.where(ft > 6.0 / 29.0, ft**3, (ft - 16.0 / 116.0) * (1.0 / 7.787))


# Degree-7 least-squares fit of the sRGB de-gamma curve ((x+.055)/1.055)^2.4
# in t = sqrt(x), over the 256 u8 grid points (scripts/fit: /tmp round 3, kept
# in tests/test_clahe_gather.py::test_degamma_poly_u8_exhaustive). Replaces the
# two 128-lane table gathers per channel (~18 ps/elem each) with ~13 VPU ops.
# f32 max abs err 2.4e-7 in linear space; exhaustive 256^3 enumeration shows
# 478 / 50.3M u8 Lab outputs flip by +-1 vs the exact path — inside the
# documented fast-math tie budget (PARITY.md #19).
_SRGB_DEGAMMA_POLY = (
    0.009077301913723199,
    -0.07309414093437108,
    0.7940191884990185,
    0.1755329417464656,
    0.06602815095251341,
    0.026846464865630783,
    0.0007837959270618305,
    0.0008063180181522742,
)

# Degree-6 fit of y^(1/2.4) in u = y^(1/4) over [0.0031308, 1]: max abs err
# 9.6e-6 (~0.0026 u8 levels after the 1.055*g-0.055 affine) — tighter than the
# fast_cbrt chain it replaces and 2 sqrt + 12 mul/add instead of ~17 ops.
_SRGB_GAMMA_POLY = (
    0.047714518636432106,
    -0.23604406967047245,
    0.5199604814878994,
    -0.7256496357751211,
    1.258747406128017,
    0.1402784399017281,
    -0.005006346544605578,
)

# Same curve with the 1.055*g - 0.055 affine AND the *255 output scale folded
# into the coefficients (the apply kernel emits u8-scale values directly):
# max abs err 0.0026 u8 levels over [0.0031308, 1].
_SRGB_GAMMA255_POLY = (
    12.835237785736428,
    -63.49701544328259,
    139.87449495175434,
    -195.2111054903446,
    338.63132790358344,
    37.7391815876927,
    -15.371907699101135,
)


def _linear_to_srgb255_fast(x, newton=False):
    """255 * (sRGB gamma of linear x), fast-math, two sqrt-free variants.

    MEASURED VERDICT (gammaab, interleaved reps at b8): the Newton
    12th-root form (bit-trick seed + 3 division-free steps, ~35 mul/adds,
    max err 0.0004 u8 levels) LOSES 2x to the 2-sqrt + degree-6 poly
    (1.69 vs 0.81 ms apply stage): its w2->w4->w12->w' chains are serially
    dependent and latency-bound, while the two sqrts pipeline fine across
    the many independent element vectors. Default is the sqrt+poly form;
    newton=True kept for the record."""
    x = jnp.maximum(x, 1e-12)
    if newton:
        xi = jax.lax.bitcast_convert_type(x, jnp.int32)
        twelfth = (xi.astype(jnp.float32) * (1.0 / 12.0)).astype(jnp.int32)
        w = jax.lax.bitcast_convert_type(jnp.int32(0x44C4902A) - twelfth, jnp.float32)
        for _ in range(3):
            w2 = w * w
            w4 = w2 * w2
            w12 = w4 * w4 * w4
            w = w * (13.0 - x * w12) * (1.0 / 12.0)
        w2 = w * w
        g = x * (w2 * w2 * w2 * w)  # x * w^7 = x^(5/12)
        g = (1.055 * 255.0) * g - (0.055 * 255.0)
    else:
        u = jnp.sqrt(jnp.sqrt(x))
        g = _SRGB_GAMMA255_POLY[0]
        for c in _SRGB_GAMMA255_POLY[1:]:
            g = g * u + c
    return jnp.where(x <= 0.0031308, x * (12.92 * 255.0), g)


def _degamma_poly(v):
    """sRGB de-gamma for u8-valued f32 input [0, 255] (fast-math path)."""
    x = v * (1.0 / 255.0)
    t = jnp.sqrt(x)
    acc = _SRGB_DEGAMMA_POLY[0]
    for c in _SRGB_DEGAMMA_POLY[1:]:
        acc = acc * t + c
    return jnp.where(x <= 0.04045, x * (1.0 / 12.92), acc)


def _fast_cbrt(x):
    """x**(1/3) for x > 0 without pow: bit-trick seed + 3 division-free
    Newton steps on z ~ x**(-1/3) (z' = z(4 - x z^3)/3), then cbrt = x z^2.

    Mosaic lowers pow as exp(log(x)*y) — two multi-pass transcendentals per
    element; this is ~20 mul/adds. Three steps drive the rel err from the
    2-step 2.3e-5 to ~1e-9 over the Lab/sRGB input ranges, eliminating the
    forward pipeline's +-1 Lab quantization-tie flips: gather-vs-XLA
    frac>0.5 on an adversarial random dark 1080p image drops 5.0e-3 ->
    1.3e-3 (maxd 12 -> 6; the residue is the apply kernel's gamma-poly
    rounding ties) for ~1.5% full-pipeline cost, inside measurement noise
    (perf_lab `cbrt3`, v5e, round 3).
    """
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    # xi // 3 via float multiply (exact trunc unnecessary: Newton absorbs
    # seed perturbations; integer div lowers poorly on the VPU).
    third = (xi.astype(jnp.float32) * (1.0 / 3.0)).astype(jnp.int32)
    z = jax.lax.bitcast_convert_type(jnp.int32(0x54A232A3) - third, jnp.float32)
    for _ in range(3):
        z = z * (4.0 - x * z * z * z) * (1.0 / 3.0)
    return x * z * z


def _linear_to_srgb(x, fastmath=True):
    x = jnp.maximum(x, 1e-12)
    if fastmath:
        # Degree-6 poly in y^(1/4) (see _SRGB_GAMMA_POLY): ~0.003 u8 levels,
        # replacing the fast_cbrt chain (c*sqrt(sqrt(c)), ~0.007 levels).
        u = jnp.sqrt(jnp.sqrt(x))
        g = _SRGB_GAMMA_POLY[0]
        for c in _SRGB_GAMMA_POLY[1:]:
            g = g * u + c
    else:
        g = x ** (1.0 / 2.4)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * g - 0.055)


def gather_supported(h: int, w: int, tiles_y: int, tiles_x: int) -> bool:
    """Shapes the Pallas gather kernel handles (others use the XLA path):
    cell-divisible, cell width within one 128-lane vreg (Mosaic dynamic_gather
    addresses a single vreg)."""
    if h % (2 * tiles_y) or w % (2 * tiles_x):
        return False
    return w // (2 * tiles_x) <= 128


def _apply_kernel(hh, hw, fastmath, nb, lab_ref, luts_ref, xa_ref, ya_ref, out_ref,
                  newton=False):
    """One program = `nb` half-tile row bands of one image (nb EVEN so the
    cell-y parity of band r inside the block is statically r % 2; many tiny
    band programs measured overhead-bound — see BENCH_NOTES.md round 2).

    Within a band the y-neighbour tiles and the ya parity are fixed. The
    band's W axis is pre-split into (ncx, hw) so the minor two dims map a
    vreg sublane to one x-cell and its lanes to the pixel offset inside that
    cell. Mosaic's dynamic_gather only addresses a single vreg along the lane
    axis, so each LUT table row is one 128-entry half of its cell's LUT —
    exactly the per-sublane gather the hardware supports.

    lab_ref:  [3, nb, hh, ncx, hw] uint8 Lab
    luts_ref: [nb, ncx, 2, 128] int32 — the 4 neighbour LUTs byte-packed into
              one word per entry: word = l00 | l01<<8 | l10<<16 | l11<<24,
              entry k*128+e of x-cell c at [c, k, e]. One packed lookup (2
              gathers + 1 select) replaces 4 lookups (8 gathers + 4 selects).
    xa_ref:   [ncx, hw] f32 — xa blend weight (x-cell parity baked in)
    ya_ref:   [hh, 2] f32 — ya by (y offset, cell-y parity)
    out_ref:  [3, nb, hh, ncx, hw] uint8 RGB
    """
    ncx = lab_ref.shape[3]
    rows = hh * ncx
    shape = (rows, hw)
    shape128 = (rows, 128)
    xa = jnp.broadcast_to(xa_ref[None], (hh, ncx, hw)).reshape(shape)

    for r in range(nb):
        # Mosaic's dynamic_gather is 2D-only: flatten (hh, ncx) -> rows (a
        # free, layout-preserving leading-dim merge; lanes stay hw).
        v = lab_ref[0, r].astype(jnp.int32).reshape(rows, hw)

        if nb % 2 == 0:
            ya2 = ya_ref[:, (r % 2) : (r % 2) + 1]  # [hh, 1], parity static
        else:
            cy = pl.program_id(1) * nb + r
            ya2 = jnp.where(cy % 2 == 0, ya_ref[:, 0:1], ya_ref[:, 1:2])
        ya = jnp.broadcast_to(ya2[:, :, None], (hh, ncx, hw)).reshape(shape)

        # 2x128-entry LUT chunks: the pixel block physically occupies 128-lane
        # vregs anyway, so padding it to 128 logical lanes once lets the packed
        # lookup be 2 gathers + 1 select instead of n_chunks of each.
        v128 = jnp.pad(v, ((0, 0), (0, 128 - hw))) if hw < 128 else v
        hi_side = v128 >= 128
        idx128 = jnp.where(hi_side, v128 - 128, v128)

        lo_t = jnp.broadcast_to(luts_ref[r, :, 0][None], (hh, ncx, 128)).reshape(shape128)
        hi_t = jnp.broadcast_to(luts_ref[r, :, 1][None], (hh, ncx, 128)).reshape(shape128)
        g_lo = jnp.take_along_axis(lo_t, idx128, axis=1)
        g_hi = jnp.take_along_axis(hi_t, idx128, axis=1)
        word = jnp.where(hi_side, g_hi, g_lo)[:, :hw]
        l00 = (word & 255).astype(jnp.float32)
        l01 = ((word >> 8) & 255).astype(jnp.float32)
        l10 = ((word >> 16) & 255).astype(jnp.float32)
        l11 = ((word >> 24) & 255).astype(jnp.float32)

        # Same multiply arrangement as clahe_u8_fast so .5-tie rounding matches.
        top = l00 * (1.0 - xa) + l01 * xa
        bot = l10 * (1.0 - xa) + l11 * xa
        L2 = jnp.clip(jnp.round(top * (1.0 - ya) + bot * ya), 0.0, 255.0)

        # Inverse 8-bit-scale Lab -> RGB (matches ops/colorspace.lab_u8_to_rgb).
        # Mosaic has no direct uint8 -> f32 cast; hop through int32.
        a8 = lab_ref[1, r].astype(jnp.int32).astype(jnp.float32).reshape(shape)
        b8 = lab_ref[2, r].astype(jnp.int32).astype(jnp.float32).reshape(shape)
        if fastmath:
            # Division-free: /116, /500, /200 and _lab_f_inv's /7.787 become
            # reciprocal multiplies (divisions are multi-pass VPU ops; six of
            # them per pixel were ~15% of the apply stage's op budget).
            fy = L2 * (100.0 / 255.0 / 116.0) + (16.0 / 116.0)
            fx = fy + (a8 - 128.0) * (1.0 / 500.0)
            fz = fy - (b8 - 128.0) * (1.0 / 200.0)
            Y = _lab_f_inv_fast(fy)
        else:
            fy = (L2 * (100.0 / 255.0) + 16.0) / 116.0
            fx = fy + (a8 - 128.0) / 500.0
            fz = fy - (b8 - 128.0) / 200.0
            Y = _lab_f_inv(fy)
        if fastmath:
            # XN/ZN folded into the matrix, affine + *255 folded into the
            # gamma poly: emits u8-scale channel values directly.
            X = _lab_f_inv_fast(fx)
            Z = _lab_f_inv_fast(fz)
            m = _XYZ2RGB_SCALED
            for c in range(3):
                ch = _linear_to_srgb255_fast(
                    m[c][0] * X + m[c][1] * Y + m[c][2] * Z, newton=newton
                )
                ch = jnp.round(jnp.clip(ch, 0.0, 255.0)).astype(jnp.int32)
                out_ref[c, r] = ch.astype(jnp.uint8).reshape(hh, ncx, hw)
        else:
            X = _lab_f_inv(fx) * _XN
            Z = _lab_f_inv(fz) * _ZN
            m = _XYZ2RGB
            for c in range(3):
                ch = _linear_to_srgb(m[c][0] * X + m[c][1] * Y + m[c][2] * Z, fastmath)
                ch = jnp.round(jnp.clip(ch, 0.0, 1.0) * 255.0).astype(jnp.int32)
                out_ref[c, r] = ch.astype(jnp.uint8).reshape(hh, ncx, hw)


def _fwd_kernel(hh, hw, fastmath, nb, rgb_ref, dg_ref, out_ref, poly=False):
    """Forward colorspace: planar u8 sRGB -> 8-bit-scale Lab u8, nb row bands.

    rgb_ref: [3, nb, hh, ncx, hw] uint8; dg_ref: [2, 128] f32 (sRGB de-gamma
    LUT in two 128-entry halves: dg[k, e] = srgb_to_linear((k*128+e)/255) —
    gathers reproduce the XLA path's de-gamma bit-for-bit since inputs are
    u8); out_ref [3, nb, hh, ncx, hw]. The only divergence from
    ops/colorspace.rgb_to_lab_u8 is the cbrt: Mosaic has no cbrt primitive,
    so the TPU build (fastmath=True) uses the Newton `_fast_cbrt` (3-step,
    ~1e-9 rel — the forward Lab math is tie-free; see `_fast_cbrt`);
    interpret/test mode uses exact jnp.cbrt, matching the XLA path bit-for-bit.
    """
    ncx = rgb_ref.shape[3]
    rows = hh * ncx
    shape = (rows, hw)
    shape128 = (rows, 128)
    if fastmath and poly:
        # Polynomial de-gamma. MEASURED ~2x SLOWER than the gather form on
        # v5e (perf_lab `polyab`, interleaved reps: sqrt is a multi-pass VPU
        # op and same-shape gathers cost only ~3.2 ps/elem) — kept for the
        # record with default poly=False.
        def degamma(vals):
            v = vals.astype(jnp.int32).astype(jnp.float32).reshape(shape)
            return _degamma_poly(v)
    else:
        lo_t = jnp.broadcast_to(dg_ref[0][None], shape128)
        hi_t = jnp.broadcast_to(dg_ref[1][None], shape128)

        def degamma(vals):
            v = vals.astype(jnp.int32).reshape(shape)
            v128 = jnp.pad(v, ((0, 0), (0, 128 - hw))) if hw < 128 else v
            hi_side = v128 >= 128
            idx = jnp.where(hi_side, v128 - 128, v128)
            g = jnp.where(
                hi_side,
                jnp.take_along_axis(hi_t, idx, axis=1),
                jnp.take_along_axis(lo_t, idx, axis=1),
            )
            return g[:, :hw]

    def lab_f(t):
        t_pos = jnp.maximum(t, 1e-12)
        cuberoot = _fast_cbrt(t_pos) if fastmath else jnp.cbrt(t_pos)
        return jnp.where(t > 0.008856, cuberoot, 7.787 * t + 16.0 / 116.0)

    for band in range(nb):
        r, g, b_ = (degamma(rgb_ref[c, band]) for c in range(3))
        if fastmath:
            # 1/XN, 1/ZN folded into the matrix: no divisions (ulp-level
            # divergence from the XLA path, PARITY #19 fast-math class).
            m = _RGB2XYZ_T_SCALED
            X = m[0][0] * r + m[0][1] * g + m[0][2] * b_
            Y = m[1][0] * r + m[1][1] * g + m[1][2] * b_
            Z = m[2][0] * r + m[2][1] * g + m[2][2] * b_
        else:
            m = _RGB2XYZ_T
            X = (m[0][0] * r + m[0][1] * g + m[0][2] * b_) / _XN
            Y = m[1][0] * r + m[1][1] * g + m[1][2] * b_
            Z = (m[2][0] * r + m[2][1] * g + m[2][2] * b_) / _ZN

        fx, fy, fz = lab_f(X), lab_f(Y), lab_f(Z)
        L8 = (116.0 * fy - 16.0) * (255.0 / 100.0)
        a8 = 500.0 * (fx - fy) + 128.0
        b8 = 200.0 * (fy - fz) + 128.0
        for c, ch in enumerate((L8, a8, b8)):
            q = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(jnp.int32)
            out_ref[c, band] = q.astype(jnp.uint8).reshape(hh, ncx, hw)


# One-hot element type for the histogram contraction: int8 halves the
# materialized one-hot operand traffic (the dot's operands cannot fuse into
# the compare, so 2 x px x 16 elements hit HBM — ~1 GB/batch at 1080p s=1
# in bf16) IF the backend lowers s8 x s8 -> s32 natively on the MXU.
# Bit-identity is trivial (exact integer counts) — MEASURED on-chip
# (perf_lab r4b, interleaved 3-rep medians): exact pipeline 3.27 -> 3.21
# ms/batch-8 (2/3 pairwise wins), luma s=1 2.43 -> 2.37; never a clear
# loss, and the s8 dot lowers natively on v5e (bit-identity maxd 0).
_HIST_I8 = True


def _hist_dot(v: jnp.ndarray, spec: str, lane_stride: int = 1) -> jnp.ndarray:
    """Shared one-hot nibble contraction: v int32 [..., px-axes] -> f32/i32
    histogram via `spec` einsum over {bf16, int8} one-hots (_HIST_I8).

    `lane_stride=s` implements the within-cell column decimation WITHOUT the
    strided slice (a lane-axis gather, a real relayout cost at s>1 —
    perf_lab r4b prefix envelope): the one-hot of every column with
    w % s != 0 is masked to zero inside the compare fusion, so those pixels
    simply don't count. Bit-identical to slicing `[..., ::s]` first.
    """
    iota = jnp.arange(16, dtype=jnp.int32)
    hi = (v >> 4)[..., None] == iota
    lo = (v & 15)[..., None] == iota
    if lane_stride > 1:
        w = v.shape[-1]
        mask = (jnp.arange(w, dtype=jnp.int32) % lane_stride == 0)[:, None]
        hi = hi & mask
    if _HIST_I8:
        return jnp.einsum(
            spec, hi.astype(jnp.int8), lo.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        )
    return jnp.einsum(
        spec, hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _hist_cells(
    l_cells: jnp.ndarray, tiles_y: int, tiles_x: int, lane_stride: int = 1
) -> jnp.ndarray:
    """Per-tile histograms straight from the cell view — no tile transpose.

    l_cells: [b, ncy, hh', ncx, hw'] uint8 (possibly hist-decimated). The
    one-hot einsum contracts the four within-tile axes (cell-y parity, row,
    cell-x parity, col) directly, with (b, tile-y, tile-x) as batch dims —
    the [b,ty,2,hh,tx,2,hw] view is a free row-major split, so the u8 tile
    transpose (~0.4 ms/batch at 1080p, the tables stage's largest single op)
    never happens. MEASURED WINNER over the transpose form (perf_lab
    r4exact: 3.43 vs 4.16 ms/batch-8 full exact pipeline) — XLA folds the
    operand transpose into the dot.
    """
    b, ncy, hh, ncx, hw = l_cells.shape
    v = l_cells.reshape(b, tiles_y, 2, hh, tiles_x, 2, hw).astype(jnp.int32)
    hist16 = _hist_dot(v, "byahxcwi,byahxcwj->byxij", lane_stride)
    return hist16.reshape(b, tiles_y, tiles_x, HIST_SIZE).astype(jnp.int32)


def _hist_planar(l_u8: jnp.ndarray, tiles_y: int, tiles_x: int) -> jnp.ndarray:
    """Per-tile histograms from [B, H, W] uint8 (nibble-MXU, ops/clahe_fast math).

    The tile transpose runs on the uint8 values and the int32 cast happens
    after: relaying 16 MB of u8 instead of 64 MB of i32 measures 1.74 ->
    0.40 ms/batch(8) at 1080p (scripts/perf_lab.py hist2)."""
    b, h, w = l_u8.shape
    th, tw = h // tiles_y, w // tiles_x
    tiles = (
        l_u8.reshape(b, tiles_y, th, tiles_x, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, tiles_y, tiles_x, th * tw)
    ).astype(jnp.int32)
    hist16 = _hist_dot(tiles, "btxpi,btxpj->btxij")
    return hist16.reshape(b, tiles_y, tiles_x, HIST_SIZE).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("clip_limit", "tiles_x", "tiles_y", "interpret", "hist_subsample"),
)
def clahe_rgb_u8_gather(
    x_u8: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    interpret: bool = False,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """uint8-native Lab-CLAHE pipeline (the production ingest path: decoded
    images are uint8; shipping u8 halves HBM traffic vs the float API).

    x_u8: uint8 NHWC (or HWC) RGB -> uint8 of the same shape. Requires
    `gather_supported` shapes (callers fall back to the XLA path otherwise).
    `hist_subsample=s` estimates the tile histograms from a within-cell
    s x s decimation of the L plane (same semantics as clahe_u8_fast's knob,
    so the XLA fallback stays bit-comparable at every s) — the tables stage
    is a shared dominant cost (BENCH_NOTES lumastages) and its histogram
    half scales with pixels sampled. Exact default s=1.
    """
    squeeze = x_u8.ndim == 3
    if squeeze:
        x_u8 = x_u8[None]
    xp = x_u8.transpose(0, 3, 1, 2)
    # NHWC ingest keeps the 6D core: interleaved A/B (perf_lab layout5b,
    # round 3) measured 4.05 ms/batch through the 6D core vs 4.34 through
    # the 5D one — the transpose+row-merge reshape in front of the 5D core
    # lays out worse than the transpose+cell reshape in front of the 6D one.
    outp = clahe_rgb_u8_planar_gather6(
        xp, clip_limit=clip_limit, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=interpret, hist_subsample=hist_subsample,
    )
    out = outp.transpose(0, 2, 3, 1)
    return out[0] if squeeze else out


@functools.partial(
    jax.jit,
    static_argnames=("clip_limit", "tiles_x", "tiles_y", "interpret", "hist_subsample"),
)
def clahe_rgb_u8_planar_gather6(
    xp_u8: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    interpret: bool = False,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """Planar uint8 pipeline, 6D cell-blocked core: [B, 3, H, W] -> same.

    Retained for A/B (perf_lab layout5/layout5b): the 5D row-merged core
    (:func:`clahe_rgb_u8_planar_gather5`) replaced it as the production
    planar entry in round 3 (3.86 vs 4.82 ms/batch-8 interleaved) — the 6D
    blocks' (ncx=16, hw=120) minor dims tile (32, 128) in u8 and every
    in-kernel [hh, ncx, hw] -> [rows, hw] merge is a padded-sublane relayout.
    """
    b, _, h, w = xp_u8.shape
    if not gather_supported(h, w, tiles_y, tiles_x):
        raise ValueError(f"shape {(h, w)} unsupported by the gather kernel")
    if hist_subsample < 1:
        raise ValueError(f"hist_subsample must be >= 1, got {hist_subsample}")
    ncy, ncx = 2 * tiles_y, 2 * tiles_x
    hh, hw = h // ncy, w // ncx

    rgb6 = xp_u8.reshape(b, 3, ncy, hh, ncx, hw)
    lab6 = _fwd_stage(rgb6, interpret)
    lab6 = _maybe_barrier(lab6)
    # Rows decimate via a cheap sublane slice; columns via the in-contraction
    # lane mask (_hist_dot lane_stride) — no lane-axis gather materializes.
    l_cells = lab6[0][:, :, ::hist_subsample]
    n_cols = (hw + hist_subsample - 1) // hist_subsample
    area = 4 * l_cells.shape[2] * n_cols  # == (2hh)(2hw) at s=1
    lane_luts = _tables_stage(
        l_cells, clip_limit, tiles_y, tiles_x, area, interpret, hist_subsample
    )
    rgbp = _apply_stage(lab6, lane_luts, interpret)
    return rgbp.reshape(b, 3, h, w)


def _fwd_stage(rgb6: jnp.ndarray, interpret: bool = False, poly: bool = False) -> jnp.ndarray:
    """[b, 3, ncy, hh, ncx, hw] u8 sRGB -> [3, b, ncy, hh, ncx, hw] u8 Lab.

    The Lab intermediate is CHANNEL-LEADING [3, b, ...] so the histogram stage
    reads the L plane as one contiguous slice (a [b, 3, ...] layout makes it
    a strided gather + relayout, measured ~1 ms/batch slower).
    """
    b, _, ncy, hh, ncx, hw = rgb6.shape
    dg_vals = srgb_to_linear(jnp.arange(HIST_SIZE, dtype=jnp.float32) / 255.0)
    dg_tab = dg_vals.reshape(2, 128)

    fastmath = not interpret  # exact transcendental math under the interpreter
    nb = _pick_bands(ncy, hh * ncx * hw)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hh, hw, fastmath, nb, poly=poly),
        grid=(b, ncy // nb),
        in_specs=[
            pl.BlockSpec(
                (None, 3, nb, hh, ncx, hw),
                lambda i, j: (i, 0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, None, nb, hh, ncx, hw),
            lambda i, j: (0, i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, b, ncy, hh, ncx, hw), jnp.uint8),
        interpret=interpret,
    )(rgb6, dg_tab)


# Elements per (band, channel) the v5e 16 MB scoped VMEM is PROVEN to hold
# at nb=4: the 1080p tiles=8 block (hh*ncx*hw = 68*16*120) * 4 bands. nb=8
# at 1080p measured 784 KB over, and 4K tiles=16 at nb=4 (2x this budget)
# OOMs the AOT compiler outright — the footprint scales with nb * band.
_VMEM_BAND_BUDGET = 4 * 68 * 16 * 120


def _pick_bands(ncy: int, band_elems: int | None = None) -> int:
    """Half-tile-row bands per kernel program. Even counts keep the apply
    kernel's cell-y parity static per unrolled band; the band count scales
    DOWN with the per-band block size (band_elems = hh*ncx*hw, one channel)
    so big frames (4K needs tiles=16 -> rows = hh*32) stay inside scoped
    VMEM instead of OOMing at the 1080p-tuned nb=4."""
    if band_elems is None:
        band_elems = _VMEM_BAND_BUDGET // 4  # legacy callers: 1080p-class
    return next(
        (d for d in (4, 2, 1) if ncy % d == 0 and d * band_elems <= _VMEM_BAND_BUDGET),
        1,
    )


# Per-kernel band-count overrides (None = _pick_bands default). Tuning knobs
# for the round-5 apply/fwd band re-sweep at the _TABLES_KERNEL defaults
# (perf_lab r5exact); every band count is bit-identical by construction (the
# banding only re-partitions the grid; the ya parity path is static at even
# nb, dynamic at odd — same values either way).
_FWD_NB: int | None = None
_APPLY_NB: int | None = None

# Histogram formulation switch (A/B'd on-chip, perf_lab r4exact): False =
# tile-transpose + merged-axis einsum (_hist_planar), True = direct cell-view
# einsum (_hist_cells, no transpose). Both are bit-identical in output.
# MEASURED (r4exact, interleaved 3-rep medians, v5e): True WINS the full
# exact pipeline 3.43 vs 4.16 ms/batch-8 (2330 vs 1923 fps) — XLA fuses the
# operand transpose the one-hot dot needs into the compare fusion, so the
# ~0.6 ms u8 tile transpose disappears. NHWC routing: 6D-core 3.44 vs
# 5D-core 3.17 medians (within noise; routing unchanged).
_HIST_CELLS = True

# Tables-stage formulation: True = single fused Pallas kernel for everything
# after the histogram (clip/redistribute/CDF/round/neighbour-select/byte-pack
# — ~15 small XLA dispatches on sub-MB tensors collapse into one program per
# image), False = the XLA op chain. Bit-identical (all arithmetic is exact
# integer-valued f32; tests/test_clahe_gather.py::test_tables_kernel_*).
# MEASURED WINNER (perf_lab r4tab, interleaved 3-rep pairs, v5e): exact
# planar 3.56->2.86 / 3.24->3.11 / 3.33->3.21 ms/batch-8 (3/3), luma s=1
# 3/3, luma s=4 2/3; 4K tiles=16 neutral; bit-identity maxd 0 on-chip
# everywhere including 4K.
_TABLES_KERNEL = True

# Stage barriers (fwd -> tables, tables -> apply). Round-2 measured them a
# win (5.03 -> 4.16 ms, perf_lab decomp) when the tables stage was ~15 XLA
# dispatches; with the fused tables kernel the graph between the Pallas
# calls is just the hist dot, so re-A/B'd in round 4 (perf_lab r4c).
_BARRIERS = True


def _maybe_barrier(x):
    return jax.lax.optimization_barrier(x) if _BARRIERS else x


def _tables_kernel(clip, lut_scale, n_cells, hist_ref, tri_ref, st_ref, out_ref):
    """Fused post-histogram tables build, one program per image.

    hist_ref: [n_tiles, 256] i32 per-tile histograms
    tri_ref:  [256, 256] f32 upper-triangular ones (cdf[e] = sum_{j<=e})
    st_ref:   [2*n_cells, n_tiles] f32 neighbour-select matrix, transposed,
              with the byte-pair weights {1, 256, 257} baked in (see
              `_tables_stage`); rows [0, n_cells) produce the lo half-word
              (l00 | l01<<8), rows [n_cells, 2*n_cells) the hi half-word
    out_ref:  [n_cells, 256] i32 packed words (l00|l01<<8|l10<<16|l11<<24)

    OpenCV clip/redistribute math identical to `_luts_from_hist`, with the
    two data-dependent integer divisions (256 // residual, bins // step)
    evaluated in f32: quotients of integers <= 256 whose true values sit
    >= 1/256 away from the nearest wrong integer, while the f32 rounding
    error is < 2^-15 — floor() recovers the exact integer quotient
    (exhaustively verified for all residuals in tests/test_clahe_gather.py).
    Both dots use precision=HIGHEST: all values are integers < 2^24, so the
    f32 contractions are exact regardless of accumulation order.
    """
    n_tiles = hist_ref.shape[0]
    hist = hist_ref[...]
    bins = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, HIST_SIZE), 1)
    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)  # [n_tiles, 1]
    redist = excess >> 8  # excess // HIST_SIZE (excess >= 0)
    residual = excess & (HIST_SIZE - 1)
    res_f = jnp.maximum(residual, 1).astype(jnp.float32)
    step_f = jnp.maximum(jnp.floor(float(HIST_SIZE) / res_f), 1.0)
    bins_f = bins.astype(jnp.float32)
    q = jnp.floor(bins_f / step_f)
    gets_one = (bins_f - q * step_f == 0.0) & (q < residual.astype(jnp.float32))
    hist3 = (clipped + redist + gets_one.astype(jnp.int32)).astype(jnp.float32)
    cdf = jax.lax.dot_general(
        hist3,
        tri_ref[...],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    luts = jnp.clip(jnp.round(cdf * lut_scale), 0.0, 255.0)
    both = jax.lax.dot_general(
        st_ref[...],
        luts,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [2*n_cells, 256]
    lo = both[:n_cells].astype(jnp.int32)
    hi = both[n_cells:].astype(jnp.int32)
    out_ref[...] = lo | (hi << 16)


def _select_matrices(tiles_y: int, tiles_x: int) -> np.ndarray:
    """[n_tiles, 2*n_cells] f32 neighbour-select matrix with byte-pair weights.

    Per-cell neighbour tiles as STATIC selection MATMULS ordered (cy, cx) —
    the output layout [b, ncy, ncx, 2, 128] is then a free reshape. XLA
    lowers both jnp.take and the earlier stack + double-gather + transpose
    formulation to serial-loop gathers on these lane-major [*, 256] tensors
    (~1.4 ms/batch, perf_lab gdecomp); a constant 0/1 selection matrix turns
    each into one tiny MXU dot (exact: LUT values <= 255 in f32).

    The byte-pairing happens INSIDE the selection matmul: weights {1, 256}
    in the 0/1 matrix compute l00 + (l01<<8) exactly in f32 (<= 65535 <
    2^24), and one [n_tiles, 2*n_cells] matrix evaluates both pairs — one
    MXU dispatch instead of four (the four tiny einsums cost ~0.6 ms of
    in-graph layout/dispatch overhead, perf_lab tables3 select-stub, r3).
    precision=HIGHEST is REQUIRED at the consuming dots: at clamped border
    cells t0x == t1x, so a weight becomes 1 + 256 = 257 — not
    bf16-representable — and the TPU default matmul precision would truncate
    it to 256, zeroing the low byte (l00) for the first/last half-tile
    columns. HIGHEST keeps the f32 contraction exact (the repo rule for
    golden-parity contractions).
    """
    t0y, t1y = _neighbor_index_tables(tiles_y)
    t0x, t1x = _neighbor_index_tables(tiles_x)
    n_cells = 4 * tiles_y * tiles_x
    n_tiles = tiles_y * tiles_x

    def sel_matrix(ty, tx):
        flat = (np.asarray(ty)[:, None] * tiles_x + np.asarray(tx)[None, :]).reshape(-1)
        s = np.zeros((n_tiles, n_cells), np.float32)
        s[flat, np.arange(n_cells)] = 1.0
        return s

    s_lo = sel_matrix(t0y, t0x) + 256.0 * sel_matrix(t0y, t1x)
    s_hi = sel_matrix(t1y, t0x) + 256.0 * sel_matrix(t1y, t1x)
    return np.concatenate([s_lo, s_hi], axis=1)


def _tables_stage(
    l_cells: jnp.ndarray,
    clip_limit: float,
    tiles_y: int,
    tiles_x: int,
    area: int,
    interpret: bool = False,
    lane_stride: int = 1,
    barrier_out: bool = True,
) -> jnp.ndarray:
    """Histograms + OpenCV LUT build + byte-packed neighbour lane tables.

    l_cells: [b, ncy, hh, ncx, hw] uint8 — the L plane only (the 5D pipeline
    must NOT reshape the full 150 MB Lab tensor into cell form just to feed
    this stage: that copy measured ~1 ms/batch, perf_lab layout5 round 3).

    Everything after the histogram runs either as the XLA op chain
    (`_luts_from_hist` + one packed-select einsum) or as ONE fused Pallas
    program per image (`_tables_kernel`, `_TABLES_KERNEL=True`) — the two
    are bit-identical; the post-hist chain is ~15 small dispatches on
    sub-MB tensors, a dispatch/layout-overhead cost, not a FLOP one.

    NOTE: callers put an optimization_barrier between the fwd kernel and this
    stage — it keeps XLA from interleaving the hist/table computation into
    the kernels' schedules (measured 5.03 -> 4.16 ms/batch, perf_lab decomp
    E vs E2): each stage compiles to its own clean program region.
    """
    if lane_stride > 1 and not _HIST_CELLS:
        # The planar-hist fallback has no masked form: materialize the slice.
        l_cells = l_cells[..., ::lane_stride]
        lane_stride = 1
    b, ncy, hh, ncx, hw = l_cells.shape
    h, w = ncy * hh, ncx * hw
    if _HIST_CELLS:
        hist = _hist_cells(l_cells, tiles_y, tiles_x, lane_stride)
    else:
        hist = _hist_planar(l_cells.reshape(b, h, w), tiles_y, tiles_x)
    n_cells = 4 * tiles_y * tiles_x
    n_tiles = tiles_y * tiles_x

    if _TABLES_KERNEL:
        clip = max(int(clip_limit * area / HIST_SIZE), 1)
        lut_scale = float(HIST_SIZE - 1) / float(area)
        tri = jnp.asarray(np.tril(np.ones((HIST_SIZE, HIST_SIZE), np.float32)).T)
        st = jnp.asarray(np.ascontiguousarray(_select_matrices(tiles_y, tiles_x).T))
        packed = pl.pallas_call(
            functools.partial(_tables_kernel, clip, lut_scale, n_cells),
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (None, n_tiles, HIST_SIZE),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (HIST_SIZE, HIST_SIZE), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2 * n_cells, n_tiles), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (None, n_cells, HIST_SIZE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, n_cells, HIST_SIZE), jnp.int32),
            interpret=interpret,
        )(hist.reshape(b, n_tiles, HIST_SIZE), tri, st)
        out = packed.reshape(b, ncy, ncx, 2, 128)
        return _maybe_barrier(out) if barrier_out else out

    luts = _luts_from_hist(hist, clip_limit, area)  # [b, ty, tx, 256] int32
    luts_flat = luts.reshape(b, n_tiles, HIST_SIZE)

    lf = luts_flat.astype(jnp.float32)
    # Byte-pack the 4 neighbour LUTs into one int32 word per entry (they are
    # always looked up at the SAME pixel value), then split into two 128-entry
    # halves: entry k*128+e of x-cell c at [.., c, k, e]. One packed gather
    # replaces four u8 gathers; same HBM bytes as four u8 tables. See
    # `_select_matrices` for the weight construction + precision rationale.
    both = jnp.einsum(
        "bte,tc->bce",
        lf,
        jnp.asarray(_select_matrices(tiles_y, tiles_x)),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    lo, hi = both[:, :n_cells], both[:, n_cells:]
    packed = lo | (hi << 16)
    out = packed.reshape(b, ncy, ncx, 2, 128)
    return _maybe_barrier(out) if barrier_out else out


def _apply_stage(
    lab6: jnp.ndarray, lane_luts: jnp.ndarray, interpret: bool = False,
    newton: bool = False,
) -> jnp.ndarray:
    """LUT apply + inverse colorspace over row bands: [3, b, ncy, hh, ncx, hw]
    u8 Lab + packed lane tables -> [b, 3, ncy, hh, ncx, hw] u8 RGB."""
    _, b, ncy, hh, ncx, hw = lab6.shape
    fastmath = not interpret
    nb = _pick_bands(ncy, hh * ncx * hw)
    wx = _blend_weights(hw)  # [2, hw] f32
    wy = _blend_weights(hh)  # [2, hh] f32
    xa_tab = jnp.asarray(wx[np.arange(ncx) % 2])  # [ncx, hw]
    ya_tab = jnp.asarray(np.ascontiguousarray(wy.T))  # [hh, 2]

    rgbp = pl.pallas_call(
        functools.partial(_apply_kernel, hh, hw, fastmath, nb, newton=newton),
        grid=(b, ncy // nb),
        in_specs=[
            pl.BlockSpec(
                (3, None, nb, hh, ncx, hw),
                lambda i, j: (0, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, nb, ncx, 2, 128),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((ncx, hw), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hh, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, 3, nb, hh, ncx, hw),
            lambda i, j: (i, 0, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, ncy, hh, ncx, hw), jnp.uint8),
        interpret=interpret,
    )(lab6, lane_luts, xa_tab, ya_tab)
    return rgbp


def _fwd_kernel5(nb, fastmath, rgb_ref, dg_ref, out_ref, poly=False):
    """5D-layout forward colorspace: planar u8 sRGB -> 8-bit Lab, nb row bands.

    Identical math to :func:`_fwd_kernel`, but blocks are [3, nb, rows, hw]
    with rows = hh * ncx pre-merged OUTSIDE the kernel: the 6D blocks' minor
    dims (ncx=16, hw=120) tile to (32, 128) in u8 — 2.13x padded in HBM/VMEM
    and every in-kernel [hh, ncx, hw] -> [rows, hw] merge is a relayout on
    padded sublanes. The 5D blocks' (rows=1088, hw=120) minor dims tile with
    only the 120 -> 128 lane pad and need no in-kernel reshapes.
    """
    rows, hw = rgb_ref.shape[2], rgb_ref.shape[3]
    shape = (rows, hw)
    shape128 = (rows, 128)
    lo_t = jnp.broadcast_to(dg_ref[0][None], shape128)
    hi_t = jnp.broadcast_to(dg_ref[1][None], shape128)

    def degamma(vals):
        v = vals.astype(jnp.int32)
        v128 = jnp.pad(v, ((0, 0), (0, 128 - hw))) if hw < 128 else v
        hi_side = v128 >= 128
        idx = jnp.where(hi_side, v128 - 128, v128)
        g = jnp.where(
            hi_side,
            jnp.take_along_axis(hi_t, idx, axis=1),
            jnp.take_along_axis(lo_t, idx, axis=1),
        )
        return g[:, :hw]

    def lab_f(t):
        t_pos = jnp.maximum(t, 1e-12)
        cuberoot = _fast_cbrt(t_pos) if fastmath else jnp.cbrt(t_pos)
        return jnp.where(t > 0.008856, cuberoot, 7.787 * t + 16.0 / 116.0)

    for band in range(nb):
        r, g, b_ = (degamma(rgb_ref[c, band]) for c in range(3))
        if fastmath:
            # 1/XN, 1/ZN folded into the matrix: no divisions (ulp-level
            # divergence from the XLA path, PARITY #19 fast-math class).
            m = _RGB2XYZ_T_SCALED
            X = m[0][0] * r + m[0][1] * g + m[0][2] * b_
            Y = m[1][0] * r + m[1][1] * g + m[1][2] * b_
            Z = m[2][0] * r + m[2][1] * g + m[2][2] * b_
        else:
            m = _RGB2XYZ_T
            X = (m[0][0] * r + m[0][1] * g + m[0][2] * b_) / _XN
            Y = m[1][0] * r + m[1][1] * g + m[1][2] * b_
            Z = (m[2][0] * r + m[2][1] * g + m[2][2] * b_) / _ZN

        fx, fy, fz = lab_f(X), lab_f(Y), lab_f(Z)
        L8 = (116.0 * fy - 16.0) * (255.0 / 100.0)
        a8 = 500.0 * (fx - fy) + 128.0
        b8 = 200.0 * (fy - fz) + 128.0
        for c, ch in enumerate((L8, a8, b8)):
            q = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(jnp.int32)
            out_ref[c, band] = q.astype(jnp.uint8)


def _apply_kernel5(ncx, fastmath, nb, lab_ref, luts_ref, xa_ref, ya_ref, out_ref):
    """5D-layout LUT apply + inverse colorspace (math of :func:`_apply_kernel`).

    lab_ref:  [3, nb, rows, hw] uint8 Lab (rows = hh * ncx, sublane r is
              cell-x r % ncx of in-cell row r // ncx)
    luts_ref: [nb, ncx, 2, 128] int32 packed neighbour LUTs
    xa_ref:   [rows, hw] f32 — xa blend weight, pre-expanded in XLA
    ya_ref:   [rows, 2] f32 — ya by (row, cell-y parity), pre-expanded
    out_ref:  [3, nb, rows, hw] uint8 RGB
    """
    rows, hw = lab_ref.shape[2], lab_ref.shape[3]
    shape = (rows, hw)
    shape128 = (rows, 128)
    hh = rows // ncx
    xa = xa_ref[...]

    for r in range(nb):
        v = lab_ref[0, r].astype(jnp.int32)

        if nb % 2 == 0:
            ya2 = ya_ref[:, (r % 2) : (r % 2) + 1]  # [rows, 1], parity static
        else:
            cy = pl.program_id(1) * nb + r
            ya2 = jnp.where(cy % 2 == 0, ya_ref[:, 0:1], ya_ref[:, 1:2])
        ya = jnp.broadcast_to(ya2, shape)

        v128 = jnp.pad(v, ((0, 0), (0, 128 - hw))) if hw < 128 else v
        hi_side = v128 >= 128
        idx128 = jnp.where(hi_side, v128 - 128, v128)

        lo_t = jnp.broadcast_to(luts_ref[r, :, 0][None], (hh, ncx, 128)).reshape(shape128)
        hi_t = jnp.broadcast_to(luts_ref[r, :, 1][None], (hh, ncx, 128)).reshape(shape128)
        g_lo = jnp.take_along_axis(lo_t, idx128, axis=1)
        g_hi = jnp.take_along_axis(hi_t, idx128, axis=1)
        word = jnp.where(hi_side, g_hi, g_lo)[:, :hw]
        l00 = (word & 255).astype(jnp.float32)
        l01 = ((word >> 8) & 255).astype(jnp.float32)
        l10 = ((word >> 16) & 255).astype(jnp.float32)
        l11 = ((word >> 24) & 255).astype(jnp.float32)

        top = l00 * (1.0 - xa) + l01 * xa
        bot = l10 * (1.0 - xa) + l11 * xa
        L2 = jnp.clip(jnp.round(top * (1.0 - ya) + bot * ya), 0.0, 255.0)

        a8 = lab_ref[1, r].astype(jnp.int32).astype(jnp.float32)
        b8 = lab_ref[2, r].astype(jnp.int32).astype(jnp.float32)
        if fastmath:
            # Division-free: /116, /500, /200 and _lab_f_inv's /7.787 become
            # reciprocal multiplies (divisions are multi-pass VPU ops; six of
            # them per pixel were ~15% of the apply stage's op budget).
            fy = L2 * (100.0 / 255.0 / 116.0) + (16.0 / 116.0)
            fx = fy + (a8 - 128.0) * (1.0 / 500.0)
            fz = fy - (b8 - 128.0) * (1.0 / 200.0)
            Y = _lab_f_inv_fast(fy)
        else:
            fy = (L2 * (100.0 / 255.0) + 16.0) / 116.0
            fx = fy + (a8 - 128.0) / 500.0
            fz = fy - (b8 - 128.0) / 200.0
            Y = _lab_f_inv(fy)
        if fastmath:
            X = _lab_f_inv_fast(fx)
            Z = _lab_f_inv_fast(fz)
            m = _XYZ2RGB_SCALED
            for c in range(3):
                ch = _linear_to_srgb255_fast(m[c][0] * X + m[c][1] * Y + m[c][2] * Z)
                ch = jnp.round(jnp.clip(ch, 0.0, 255.0)).astype(jnp.int32)
                out_ref[c, r] = ch.astype(jnp.uint8)
        else:
            X = _lab_f_inv(fx) * _XN
            Z = _lab_f_inv(fz) * _ZN
            m = _XYZ2RGB
            for c in range(3):
                ch = _linear_to_srgb(m[c][0] * X + m[c][1] * Y + m[c][2] * Z, fastmath)
                ch = jnp.round(jnp.clip(ch, 0.0, 1.0) * 255.0).astype(jnp.int32)
                out_ref[c, r] = ch.astype(jnp.uint8)


def _fwd_stage5(rgb5: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[b, 3, ncy, rows, hw] u8 sRGB -> [3, b, ncy, rows, hw] u8 Lab."""
    b, _, ncy, rows, hw = rgb5.shape
    dg_vals = srgb_to_linear(jnp.arange(HIST_SIZE, dtype=jnp.float32) / 255.0)
    dg_tab = dg_vals.reshape(2, 128)
    fastmath = not interpret
    nb = _FWD_NB if _FWD_NB and ncy % _FWD_NB == 0 else _pick_bands(ncy, rows * hw)
    return pl.pallas_call(
        functools.partial(_fwd_kernel5, nb, fastmath),
        grid=(b, ncy // nb),
        in_specs=[
            pl.BlockSpec(
                (None, 3, nb, rows, hw),
                lambda i, j: (i, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, None, nb, rows, hw),
            lambda i, j: (0, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, b, ncy, rows, hw), jnp.uint8),
        interpret=interpret,
    )(rgb5, dg_tab)


def _apply_stage5(
    lab5: jnp.ndarray, lane_luts: jnp.ndarray, ncx: int, interpret: bool = False
) -> jnp.ndarray:
    """[3, b, ncy, rows, hw] u8 Lab + packed tables -> [b, 3, ncy, rows, hw] u8."""
    _, b, ncy, rows, hw = lab5.shape
    hh = rows // ncx
    fastmath = not interpret
    nb = (
        _APPLY_NB
        if _APPLY_NB and ncy % _APPLY_NB == 0
        else _pick_bands(ncy, rows * hw)
    )
    wx = _blend_weights(hw)  # [2, hw]
    wy = _blend_weights(hh)  # [2, hh]
    # Pre-expanded blend weights: [rows, hw] and [rows, 2] (one 0.5 MB
    # constant beats per-band broadcast+reshape inside the kernel).
    xa_full = jnp.asarray(
        np.broadcast_to(wx[np.arange(ncx) % 2][None], (hh, ncx, hw)).reshape(rows, hw)
    )
    ya_full = jnp.asarray(
        np.broadcast_to(wy.T[:, None, :], (hh, ncx, 2)).reshape(rows, 2)
    )

    return pl.pallas_call(
        functools.partial(_apply_kernel5, ncx, fastmath, nb),
        grid=(b, ncy // nb),
        in_specs=[
            pl.BlockSpec(
                (3, None, nb, rows, hw),
                lambda i, j: (0, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, nb, ncx, 2, 128),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((rows, hw), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, 3, nb, rows, hw),
            lambda i, j: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, ncy, rows, hw), jnp.uint8),
        interpret=interpret,
    )(lab5, lane_luts, xa_full, ya_full)


@functools.partial(
    jax.jit,
    static_argnames=("clip_limit", "tiles_x", "tiles_y", "interpret", "hist_subsample"),
)
def clahe_rgb_u8_planar_gather5(
    xp_u8: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    interpret: bool = False,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """5D-layout planar uint8 pipeline: [B, 3, H, W] -> [B, 3, H, W].

    The production planar entry (fastest path, round 3): same math as the
    6D core :func:`clahe_rgb_u8_planar_gather6`, but kernels stream
    [*, rows, hw] blocks (see `_fwd_kernel5` for why) — 3.86 vs 4.82
    ms/batch-8 interleaved on v5e (perf_lab layout5b). `hist_subsample`:
    see :func:`clahe_rgb_u8_gather`."""
    b, _, h, w = xp_u8.shape
    if not gather_supported(h, w, tiles_y, tiles_x):
        raise ValueError(f"shape {(h, w)} unsupported by the gather kernel")
    if hist_subsample < 1:
        raise ValueError(f"hist_subsample must be >= 1, got {hist_subsample}")
    ncy, ncx = 2 * tiles_y, 2 * tiles_x
    hh, hw = h // ncy, w // ncx
    rows = hh * ncx

    rgb5 = xp_u8.reshape(b, 3, ncy, rows, hw)
    lab5 = _fwd_stage5(rgb5, interpret)
    lab5 = _maybe_barrier(lab5)
    # L plane only into cell form (reshaping the full Lab tensor to 6D for
    # the tables stage measured ~1 ms/batch of pure relayout copy).
    # Rows decimate via a cheap sublane slice; columns via the in-contraction
    # lane mask (_hist_dot lane_stride) — no lane-axis gather materializes.
    l_cells = lab5[0].reshape(b, ncy, hh, ncx, hw)[:, :, ::hist_subsample]
    n_cols = (hw + hist_subsample - 1) // hist_subsample
    area = 4 * l_cells.shape[2] * n_cols  # == (2hh)(2hw) at s=1
    lane_luts = _tables_stage(
        l_cells, clip_limit, tiles_y, tiles_x, area, interpret, hist_subsample
    )
    rgbp = _apply_stage5(lab5, lane_luts, ncx, interpret)
    return rgbp.reshape(b, 3, h, w)


# Public planar entry = the 5D core (bit-identical to the 6D core; see
# tests/test_clahe_gather.py::test_planar5_matches_planar6).
clahe_rgb_u8_planar_gather = clahe_rgb_u8_planar_gather5


@functools.partial(
    jax.jit,
    static_argnames=("clip_limit", "tiles_x", "tiles_y", "interpret", "hist_subsample"),
)
def clahe_lab_rgb_gather(
    x: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    interpret: bool = False,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """Float wrapper over the planar u8 core (drop-in for
    ops/clahe.clahe_lab_rgb on supported shapes). x: float [0,1] NHWC/HWC.

    Glue order per the perf_lab f32wrap A/B (round 3): transpose the f32
    NHWC FIRST and quantize into the planar u8 layout (no u8 NHWC
    intermediate: 0.86 -> 0.35 ms of in-glue), and cast back to f32 BEFORE
    the outbound transpose (XLA fuses the convert into the relayout;
    4.93 -> 4.60 ms full-pipeline). Core is the 5D planar pipeline
    (4.96 vs 5.04 ms/batch-8 vs the 6D core, layout5b)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    xp = x.transpose(0, 3, 1, 2)
    xq = jnp.clip(jnp.round(jnp.clip(xp, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)
    outp = clahe_rgb_u8_planar_gather5(
        xq, clip_limit=clip_limit, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=interpret, hist_subsample=hist_subsample,
    )
    out = (outp.astype(jnp.float32) / 255.0).transpose(0, 2, 3, 1)
    return out[0] if squeeze else out
