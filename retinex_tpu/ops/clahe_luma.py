"""Fast luma-gain CLAHE: the documented reduced-parity mode past the Lab SOL.

The exact cv2-parity Lab pipeline (ops/clahe_gather.py) is VPU-bound at a
speed-of-light of ~2,900-3,100 fps/chip u8 at 1080p (BENCH_NOTES.md round-3
SOL analysis): the inverse Lab->sRGB colorspace alone (3x lab_f_inv + 3x3
matrix + 3 gamma curves, ~100 op-slots/pixel) costs more than the 5,000 fps
north-star allows END-TO-END. This module is the algorithmic alternative
that analysis points to: equalize a *luma* plane and apply the result as a
multiplicative RGB gain, skipping both colorspace transforms.

Algorithm (NOT reference behavior — an extra mode, see PARITY.md):

- y = round(0.299 R + 0.587 G + 0.114 B) on the gamma-encoded u8 values
  (BT.601, the Y of cv2's RGB->YCrCb).
- CLAHE on y with the exact OpenCV tile-LUT build (clip/redistribute/CDF —
  the same `_luts_from_hist`/`_tables_stage` as the Lab path, golden-tested
  vs cv2) and the same bilinear 4-neighbour blend -> y_eq.
- gain = (y_eq + 1) / (y + 1)  (the +1 keeps black pixels finite and smooth),
  out_c = round(clip(rgb_c * gain, 0, 255)).

vs the Lab path: contrast equalization is nearly identical (both equalize a
luminance plane with the same LUTs); the difference is chroma handling — Lab
holds a/b fixed (hue+chroma constant in Lab space) while the gain scales RGB
proportionally (hue-preserving in RGB ratios, chroma scales with the gain,
saturated channels clip). Per-pixel cost drops from ~230 VPU op-slots to
~45. MEASURED (perf_lab lumafast, interleaved same-process A/B, v5e):
2.65-2.99 ms/batch-8 ≈ 2,700-3,000 fps/chip planar u8 vs 3.96-4.15 ms ≈
1,930-2,040 for Lab (~1.45x), f32 wrapper 3.49 ms ≈ 2,290 fps vs 4.83 ≈
1,656; the kernel is bit-exact vs the XLA oracle on-chip (maxd 0). The
op-count prediction (~1.5-1.8 ms) overshot because the tables stage and
HBM glue (~1.3 ms combined) don't shrink with the apply math — see the
lumastages attribution in BENCH_NOTES.md.

Structure mirrors the Lab 5D pipeline (one XLA luma pass replaces the fwd
kernel; `_tables_stage` is reused verbatim; one Pallas apply kernel):

- luma (XLA): fused cast/weighted-sum/round, [b,3,H,W] u8 -> [b,H,W] u8.
- tables (XLA, ops/clahe_gather._tables_stage): nibble-MXU histograms,
  OpenCV LUT build, byte-packed neighbour lane tables.
- `_apply_luma_kernel5` (Pallas, 5D row-merged layout): packed-word LUT
  lookup (2 same-shape lane gathers + select), bilinear blend, gain, 3x
  multiply — no transcendentals at all.

Reference context: enhancers/adaptive_params.py:121-169 is the Lab-CLAHE
behavior bar; this mode intentionally diverges (documented in PARITY.md) in
exchange for ~3.5x throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retinex_tpu.ops.clahe_fast import _blend_weights, clahe_u8_fast
from retinex_tpu.ops.clahe_gather import _pick_bands, _tables_stage, gather_supported

# BT.601 luma weights on gamma-encoded values (cv2 RGB->YCrCb Y channel).
_LUMA_R, _LUMA_G, _LUMA_B = 0.299, 0.587, 0.114

# gain = (y_eq+1) * table[1/(y+1)] instead of (y_eq+1) / (y+1): y is uint8,
# so the 256 reciprocals are a [2, 128] f32 lane table and the kernel reuses
# the LUT lookup's (idx128, hi_side) — ~3 extra gather slots replace the
# per-pixel multi-pass VPU division. The XLA oracle uses the SAME table so
# the two formulations stay bit-identical; vs the division form the gain
# differs by <= 1 ulp (can flip the rounded output +-1 at exact ties —
# inside the mode's own documented divergence class, PARITY.md #20).
# MEASURED LOSER on-chip (perf_lab r4b, luma s=4 interleaved medians:
# 1.87 division vs 2.07 ms/batch-8 table, 2/3 pairwise) — the division
# pipelines fine across the independent row vectors while the extra
# gathers contend with the LUT lookup's. Default stays False (division).
_RECIP_GAIN = False


def _recip_table():
    return 1.0 / (jnp.arange(256, dtype=jnp.float32) + 1.0)


def _luma_u8(xp_u8: jnp.ndarray) -> jnp.ndarray:
    """[b, 3, H, W] u8 -> [b, H, W] u8 luma (XLA fuses cast+madd+round)."""
    r = xp_u8[:, 0].astype(jnp.float32)
    g = xp_u8[:, 1].astype(jnp.float32)
    b = xp_u8[:, 2].astype(jnp.float32)
    y = _LUMA_R * r + _LUMA_G * g + _LUMA_B * b
    return jnp.clip(jnp.round(y), 0.0, 255.0).astype(jnp.uint8)


def _apply_luma_kernel5(ncx, nb, recip_gain, rgb_ref, y_ref, luts_ref, xa_ref, ya_ref,
                        rc_ref, out_ref):
    """5D-layout luma-gain apply: LUT lookup + blend + multiplicative gain.

    rgb_ref:  [3, nb, rows, hw] uint8 sRGB (rows = hh * ncx)
    y_ref:    [nb, rows, hw] uint8 luma (the SAME plane the histograms saw)
    luts_ref: [nb, ncx, 2, 128] int32 byte-packed neighbour LUTs
              (ops/clahe_gather._tables_stage layout)
    xa_ref:   [rows, hw] f32, ya_ref: [rows, 2] f32 pre-expanded blend weights
    rc_ref:   [2, 128] f32 reciprocal table 1/(v+1) (used when recip_gain)
    out_ref:  [3, nb, rows, hw] uint8
    """
    rows, hw = y_ref.shape[1], y_ref.shape[2]
    shape128 = (rows, 128)
    hh = rows // ncx
    xa = xa_ref[...]

    for r in range(nb):
        v = y_ref[r].astype(jnp.int32)

        if nb % 2 == 0:
            ya2 = ya_ref[:, (r % 2) : (r % 2) + 1]  # [rows, 1], parity static
        else:
            cy = pl.program_id(1) * nb + r
            ya2 = jnp.where(cy % 2 == 0, ya_ref[:, 0:1], ya_ref[:, 1:2])
        ya = jnp.broadcast_to(ya2, (rows, hw))

        # Packed-word lookup: identical to ops/clahe_gather._apply_kernel5.
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

        # Same multiply arrangement as the Lab path so rounding ties match
        # the XLA reference formulation (clahe_luma_rgb_u8_xla).
        top = l00 * (1.0 - xa) + l01 * xa
        bot = l10 * (1.0 - xa) + l11 * xa
        y_eq = jnp.clip(jnp.round(top * (1.0 - ya) + bot * ya), 0.0, 255.0)

        if recip_gain:
            # Reuse the LUT lookup's (idx128, hi_side): 2 gathers + select
            # replace the multi-pass VPU division (see _RECIP_GAIN).
            r_lo = jnp.broadcast_to(rc_ref[0][None], shape128)
            r_hi = jnp.broadcast_to(rc_ref[1][None], shape128)
            rec = jnp.where(
                hi_side,
                jnp.take_along_axis(r_hi, idx128, axis=1),
                jnp.take_along_axis(r_lo, idx128, axis=1),
            )[:, :hw]
            gain = (y_eq + 1.0) * rec
        else:
            gain = (y_eq + 1.0) / (v.astype(jnp.float32) + 1.0)
        for c in range(3):
            ch = rgb_ref[c, r].astype(jnp.int32).astype(jnp.float32)
            o = jnp.round(jnp.clip(ch * gain, 0.0, 255.0)).astype(jnp.int32)
            out_ref[c, r] = o.astype(jnp.uint8)


def _apply_luma_kernel5_fused(ncx, nb, recip_gain, rgb_ref, luts_ref, xa_ref, ya_ref,
                              rc_ref, out_ref):
    """Fused variant of :func:`_apply_luma_kernel5`: recomputes the luma plane
    in-kernel from the RGB block it already loads (same formula and operation
    order as :func:`_luma_u8`, so interpret mode is bit-identical) instead of
    taking it as an operand. Drops the [nb, rows, hw] y block from the
    kernel's DMA and leaves the XLA luma pass with a single consumer (the
    histogram tile transpose), letting XLA fuse luma straight into that copy
    — the linear-layout y plane never materializes in HBM.
    """
    rows, hw = rgb_ref.shape[2], rgb_ref.shape[3]
    shape128 = (rows, 128)
    hh = rows // ncx
    xa = xa_ref[...]

    for r in range(nb):
        # In-kernel luma (u8 -> int32 -> f32: Mosaic has no direct u8 cast).
        rgb_f = [rgb_ref[c, r].astype(jnp.int32).astype(jnp.float32) for c in range(3)]
        y_f = _LUMA_R * rgb_f[0] + _LUMA_G * rgb_f[1] + _LUMA_B * rgb_f[2]
        v = jnp.clip(jnp.round(y_f), 0.0, 255.0).astype(jnp.int32)

        if nb % 2 == 0:
            ya2 = ya_ref[:, (r % 2) : (r % 2) + 1]  # [rows, 1], parity static
        else:
            cy = pl.program_id(1) * nb + r
            ya2 = jnp.where(cy % 2 == 0, ya_ref[:, 0:1], ya_ref[:, 1:2])
        ya = jnp.broadcast_to(ya2, (rows, hw))

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
        y_eq = jnp.clip(jnp.round(top * (1.0 - ya) + bot * ya), 0.0, 255.0)

        if recip_gain:
            r_lo = jnp.broadcast_to(rc_ref[0][None], shape128)
            r_hi = jnp.broadcast_to(rc_ref[1][None], shape128)
            rec = jnp.where(
                hi_side,
                jnp.take_along_axis(r_hi, idx128, axis=1),
                jnp.take_along_axis(r_lo, idx128, axis=1),
            )[:, :hw]
            gain = (y_eq + 1.0) * rec
        else:
            gain = (y_eq + 1.0) / (v.astype(jnp.float32) + 1.0)
        for c in range(3):
            o = jnp.round(jnp.clip(rgb_f[c] * gain, 0.0, 255.0)).astype(jnp.int32)
            out_ref[c, r] = o.astype(jnp.uint8)


def _apply_luma_stage5_fused(
    rgb5: jnp.ndarray,
    lane_luts: jnp.ndarray,
    ncx: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[b, 3, ncy, rows, hw] u8 + packed tables -> [b, 3, ncy, rows, hw] u8
    (luma recomputed in-kernel; no y operand)."""
    b, _, ncy, rows, hw = rgb5.shape
    hh = rows // ncx
    nb = _pick_bands(ncy, rows * hw)
    wx = _blend_weights(hw)  # [2, hw]
    wy = _blend_weights(hh)  # [2, hh]
    xa_full = jnp.asarray(
        np.broadcast_to(wx[np.arange(ncx) % 2][None], (hh, ncx, hw)).reshape(rows, hw)
    )
    ya_full = jnp.asarray(
        np.broadcast_to(wy.T[:, None, :], (hh, ncx, 2)).reshape(rows, 2)
    )

    return pl.pallas_call(
        functools.partial(_apply_luma_kernel5_fused, ncx, nb, _RECIP_GAIN),
        grid=(b, ncy // nb),
        in_specs=[
            pl.BlockSpec(
                (None, 3, nb, rows, hw),
                lambda i, j: (i, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, nb, ncx, 2, 128),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((rows, hw), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, 3, nb, rows, hw),
            lambda i, j: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, ncy, rows, hw), jnp.uint8),
        interpret=interpret,
    )(rgb5, lane_luts, xa_full, ya_full, _recip_table().reshape(2, 128))


def _apply_luma_stage5(
    rgb5: jnp.ndarray,
    y5: jnp.ndarray,
    lane_luts: jnp.ndarray,
    ncx: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[b, 3, ncy, rows, hw] u8 + [b, ncy, rows, hw] luma + packed tables
    -> [b, 3, ncy, rows, hw] u8."""
    b, _, ncy, rows, hw = rgb5.shape
    hh = rows // ncx
    nb = _pick_bands(ncy, rows * hw)
    wx = _blend_weights(hw)  # [2, hw]
    wy = _blend_weights(hh)  # [2, hh]
    xa_full = jnp.asarray(
        np.broadcast_to(wx[np.arange(ncx) % 2][None], (hh, ncx, hw)).reshape(rows, hw)
    )
    ya_full = jnp.asarray(
        np.broadcast_to(wy.T[:, None, :], (hh, ncx, 2)).reshape(rows, 2)
    )

    return pl.pallas_call(
        functools.partial(_apply_luma_kernel5, ncx, nb, _RECIP_GAIN),
        grid=(b, ncy // nb),
        in_specs=[
            pl.BlockSpec(
                (None, 3, nb, rows, hw),
                lambda i, j: (i, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, nb, rows, hw),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, nb, ncx, 2, 128),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((rows, hw), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, 3, nb, rows, hw),
            lambda i, j: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, ncy, rows, hw), jnp.uint8),
        interpret=interpret,
    )(rgb5, y5, lane_luts, xa_full, ya_full, _recip_table().reshape(2, 128))


@functools.partial(
    jax.jit,
    static_argnames=(
        "clip_limit", "tiles_x", "tiles_y", "interpret", "fuse_luma", "hist_subsample"
    ),
)
def clahe_luma_rgb_u8_planar(
    xp_u8: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    interpret: bool = False,
    fuse_luma: bool = False,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """Planar uint8 luma-gain CLAHE: [B, 3, H, W] -> [B, 3, H, W].

    Requires `gather_supported` shapes (callers fall back to the XLA
    formulation otherwise). `fuse_luma=True` recomputes the luma plane inside
    the apply kernel (one decimated XLA luma pass feeds only the histograms)
    instead of materializing it as a kernel operand — bit-identical in
    interpret mode (tests/test_clahe_luma.py) and bit-exact on-chip (maxd 0
    at s=1/2/4). MEASURED LOSER at every s (perf_lab r4luma, interleaved
    3-rep medians, v5e: s=1 3.46 vs 2.58 ms/batch-8, s=4 2.78 vs 1.66 —
    the strided decimated-RGB luma pass lays out badly and the in-kernel
    luma recompute adds VPU work that dwarfs the 16 MB y-plane DMA it
    saves; the round-3 lumafuse run that measured neutral used the
    full-plane luma pass). Default stays False.

    `hist_subsample=s` estimates the tile histograms from a within-cell
    s x s decimation of the luma plane (clip threshold and CDF scale follow
    the reduced area — the same semantics as clahe_u8_fast's knob, so the
    XLA oracle stays bit-comparable). The tables stage is this pipeline's
    dominant cost (~1.5 of 2.65 ms/batch-8, BENCH_NOTES lumastages) and its
    histogram half scales with pixels sampled; s=2 reads 1/4 of them. An
    approximation knob on an already reduced-parity mode — default 1."""
    b, _, h, w = xp_u8.shape
    if not gather_supported(h, w, tiles_y, tiles_x):
        raise ValueError(f"shape {(h, w)} unsupported by the gather kernel")
    if hist_subsample < 1:
        raise ValueError(f"hist_subsample must be >= 1, got {hist_subsample}")
    ncy, ncx = 2 * tiles_y, 2 * tiles_x
    hh, hw = h // ncy, w // ncx
    rows = hh * ncx

    if fuse_luma:
        # The apply kernel recomputes luma in-kernel, so only the histogram
        # needs a luma plane — and it reads every hist_subsample-th pixel.
        # Compute luma ONLY on those: at s=4 the XLA luma pass shrinks 16x
        # (the full-plane pass reads all 50 MB of RGB). Identical per-pixel
        # math and operation order as _luma_u8, so histograms (and the final
        # output) are bit-identical to the unfused path at every s.
        xd = xp_u8.reshape(b, 3, ncy, hh, ncx, hw)[
            :, :, :, ::hist_subsample, :, ::hist_subsample
        ]
        r_ = xd[:, 0].astype(jnp.float32)
        g_ = xd[:, 1].astype(jnp.float32)
        b_ = xd[:, 2].astype(jnp.float32)
        y_cells = jnp.clip(
            jnp.round(_LUMA_R * r_ + _LUMA_G * g_ + _LUMA_B * b_), 0.0, 255.0
        ).astype(jnp.uint8)
        lane_stride = 1
        area = 4 * y_cells.shape[2] * y_cells.shape[4]
    else:
        y = _luma_u8(xp_u8)  # [b, h, w]
        # Rows decimate via a cheap sublane slice; columns via the
        # in-contraction lane mask (ops/clahe_gather._hist_dot) — no
        # lane-axis gather materializes.
        y_cells = y.reshape(b, ncy, hh, ncx, hw)[:, :, ::hist_subsample]
        lane_stride = hist_subsample
        n_cols = (hw + hist_subsample - 1) // hist_subsample
        area = 4 * y_cells.shape[2] * n_cols  # == (2hh)(2hw) at s=1
    # barrier_out=False: the luma pipeline has no fwd-side barrier, and the
    # tables->apply barrier measured a consistent 3/3 LOSS here (perf_lab
    # r4c: s=4 1.44-1.54 ms with vs 1.30-1.45 without); the exact-Lab
    # pipelines keep their barriers (2/3 win there).
    lane_luts = _tables_stage(
        y_cells, clip_limit, tiles_y, tiles_x, area, interpret, lane_stride,
        barrier_out=False,
    )

    rgb5 = xp_u8.reshape(b, 3, ncy, rows, hw)
    if fuse_luma:
        out5 = _apply_luma_stage5_fused(rgb5, lane_luts, ncx, interpret)
    else:
        y5 = y.reshape(b, ncy, rows, hw)
        out5 = _apply_luma_stage5(rgb5, y5, lane_luts, ncx, interpret)
    return out5.reshape(b, 3, h, w)


@functools.partial(
    jax.jit,
    static_argnames=("clip_limit", "tiles_x", "tiles_y", "interpret", "hist_subsample"),
)
def clahe_luma_rgb_u8(
    x_u8: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    interpret: bool = False,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """uint8 NHWC (or HWC) luma-gain CLAHE."""
    squeeze = x_u8.ndim == 3
    if squeeze:
        x_u8 = x_u8[None]
    xp = x_u8.transpose(0, 3, 1, 2)
    outp = clahe_luma_rgb_u8_planar(
        xp, clip_limit=clip_limit, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=interpret, hist_subsample=hist_subsample,
    )
    out = outp.transpose(0, 2, 3, 1)
    return out[0] if squeeze else out


@functools.partial(
    jax.jit, static_argnames=("clip_limit", "tiles_x", "tiles_y", "hist_subsample")
)
def clahe_luma_rgb_u8_xla(
    x_u8: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """Pure-XLA formulation of the same algorithm (any shape, any platform).

    The parity oracle for the Pallas kernel (tests/test_clahe_luma.py) and
    the fallback for unsupported shapes: `clahe_u8_fast` evaluates the
    identical tile LUTs + bilinear blend on the luma plane (including the
    same within-cell `hist_subsample` decimation, so the two formulations
    stay bit-comparable at every s)."""
    squeeze = x_u8.ndim == 3
    if squeeze:
        x_u8 = x_u8[None]
    xp = x_u8.transpose(0, 3, 1, 2)
    y = _luma_u8(xp)
    y_eq = clahe_u8_fast(
        y, clip_limit=clip_limit, tiles_x=tiles_x, tiles_y=tiles_y,
        hist_subsample=hist_subsample,
    )
    if _RECIP_GAIN:
        # Same 256-entry reciprocal table as the Pallas kernel, so the two
        # formulations stay bit-identical (see _RECIP_GAIN).
        gain = (y_eq.astype(jnp.float32) + 1.0) * jnp.take(
            _recip_table(), y.astype(jnp.int32)
        )
    else:
        gain = (y_eq.astype(jnp.float32) + 1.0) / (y.astype(jnp.float32) + 1.0)
    o = jnp.round(jnp.clip(xp.astype(jnp.float32) * gain[:, None], 0.0, 255.0))
    out = o.astype(jnp.uint8).transpose(0, 2, 3, 1)
    return out[0] if squeeze else out


def clahe_luma_rgb(
    x: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles: int = 8,
    use_pallas: bool | None = None,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """Float [0,1] NHWC/HWC luma-gain CLAHE (the `clahe_luma` enhance mode).

    Routing mirrors ops/clahe.clahe_lab_rgb: the Pallas pipeline on TPU for
    supported shapes, the XLA formulation otherwise (bit-identical up to FMA
    formation at exact .5 blend ties). `hist_subsample` is the decimated-
    histogram speed knob (see clahe_luma_rgb_u8_planar); on shapes where the
    XLA fallback is not cell-divisible the exact histogram runs instead
    (strictly higher fidelity, clahe_u8_fast routing)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if use_pallas is None:
        use_pallas = True
    # Same routing convention as ops/clahe.clahe_lab_rgb: Pallas only off-CPU
    # (Mosaic kernels need interpret mode there) and on supported shapes.
    on_accel = jax.devices()[0].platform != "cpu"
    if use_pallas and on_accel and gather_supported(x.shape[1], x.shape[2], tiles, tiles):
        xp = x.transpose(0, 3, 1, 2)
        xq = jnp.clip(jnp.round(jnp.clip(xp, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)
        outp = clahe_luma_rgb_u8_planar(
            xq, clip_limit=clip_limit, tiles_x=tiles, tiles_y=tiles,
            hist_subsample=hist_subsample,
        )
        out = (outp.astype(jnp.float32) / 255.0).transpose(0, 2, 3, 1)
    else:
        xq = jnp.clip(jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)
        out = clahe_luma_rgb_u8_xla(
            xq, clip_limit=clip_limit, tiles_x=tiles, tiles_y=tiles,
            hist_subsample=hist_subsample,
        ).astype(jnp.float32) / 255.0
    return out[0] if squeeze else out
