"""MXU-friendly CLAHE: nibble-decomposed histograms and LUT application.

The straightforward jnp CLAHE (ops/clahe.py) is gather-bound on TPU (~80ms per
1080p frame: 4 per-pixel LUT gathers serialize on the scalar path). This
module reformulates both stages as dense one-hot algebra the MXU/VPU execute
well, with NO per-pixel gathers:

- A pixel value v in [0,256) splits into nibbles v = 16*hi + lo. The 256-wide
  one-hot of v is the outer product of two 16-wide one-hots — 32 vector
  compares per pixel instead of 256.
- Tile histogram: hist[16i+j] = sum_p hi_oh[p,i] * lo_oh[p,j]
  = hi_oh^T @ lo_oh — one [16,A]x[A,16] matmul per tile on the MXU.
- LUT evaluation: lut[v] = hi_oh[p,:] @ LUT16x16 @ lo_oh[p,:]^T — a [A,16]
  matmul plus a 16-wide row-dot per pixel.
- Bilinear tile interpolation: the image is cut into half-tile "cells"; within
  a cell the 4 neighbouring tile LUTs are FIXED, and the (xa, ya) interpolation
  weights depend only on the pixel offset inside the cell and the cell parity —
  a static [2, cell] table. So the 4 LUT evaluations + blend are uniform dense
  math per cell.

Bit-identical to ops/clahe.clahe_u8 (and hence to OpenCV on the L channel)
whenever H is divisible by 2*tiles_y and W by 2*tiles_x; other shapes fall back.
one-hots are exact in bf16 and LUT values (<=255) are exactly representable,
so MXU bf16 passes lose nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from retinex_tpu.ops.clahe import HIST_SIZE, _tile_luts, clahe_u8


# hist_subsample sampling pattern: symmetric s x s within each half-tile
# cell, shared with the gather/luma paths (clahe_gather.py, clahe_luma.py —
# their oracles compare bit-for-bit against this routing, so any pattern
# change must land in all three at once). A ROW-ONLY alternative (every
# (s*s)-th row, all columns — same sample budget, genuinely shrinks the
# contraction instead of lane-masking it) measured quality-equivalent in an
# ad-hoc 13-image PSNR study (row-only s=2 med 55.2 dB vs symmetric 55.9;
# s=4 49.9 vs 49.3 — the probe script was not kept); it stays unwired
# because the masked-lane form already removed the gather cost (r4c,
# BENCH_NOTES) and a pattern flip here alone would silently desynchronize
# the sibling paths.


def _hist_from_cells(
    v5: jnp.ndarray, hist_subsample: int = 1
) -> tuple[jnp.ndarray, int]:
    """Per-tile histograms from a half-tile cell view.

    v5: [b, ncy_loc, hh, ncx, hw] int32 — WHOLE tile rows (ncy_loc even).
    Returns ([b, ncy_loc/2, ncx/2, 256] int32 histograms, sampled tile area).
    Shared by clahe_u8_fast and the H-sharded path (parallel/spatial.py):
    tile histograms are H-local, so a shard holding whole tile rows computes
    its rows' histograms with the exact single-device math — the stage-1
    nibble einsum sums integers < 2^24 in f32, exact under any partition.
    """
    b, ncy_l, _, ncx_l, _ = v5.shape
    vh = v5[:, :, ::hist_subsample, :, ::hist_subsample]
    hh2, hw2 = vh.shape[2], vh.shape[4]
    cells_h = vh.transpose(0, 1, 3, 2, 4).reshape(b, ncy_l, ncx_l, hh2 * hw2)
    chi, clo = _nibble_onehots(cells_h)  # [b,cy,cx,P,16]
    cell_hist = jnp.einsum(
        "bcdpi,bcdpj->bcdij", chi, clo, preferred_element_type=jnp.float32
    )  # [b,cy,cx,16,16]
    hist16 = (
        cell_hist.reshape(b, ncy_l // 2, 2, ncx_l // 2, 2, 16, 16).sum(axis=(2, 4))
    )
    hist = hist16.reshape(b, ncy_l // 2, ncx_l // 2, HIST_SIZE).astype(jnp.int32)
    return hist, 4 * hh2 * hw2


def _apply_from_cells(
    v5: jnp.ndarray,
    luts: jnp.ndarray,
    tiles_y: int,
    tiles_x: int,
    row0=0,
) -> jnp.ndarray:
    """Stage 3: per-cell LUT evaluation + separable bilinear blend.

    v5:   [b, ncy_loc, hh, ncx, hw] int32 cell view (a slab of whole cell rows).
    luts: [b, tiles_y, tiles_x, 256] int32 — the FULL (global) tile tables.
    row0: global index of v5's first cell row — 0 for the single-device path
    (static: every slice below folds away), `axis_index * ncy_loc` under the
    H-sharded path (parallel/spatial.py), where it selects this shard's
    neighbour-LUT rows and blend-weight parities out of the global tables.
    Returns [b, h_loc, w] int32.
    """
    b, ncy_l, hh, ncx, hw = v5.shape
    cells = v5.transpose(0, 1, 3, 2, 4).reshape(b, ncy_l, ncx, hh * hw)
    # Barrier: regenerate the one-hots from a distinct value so the stage-1
    # one-hots are never materialized for reuse (see clahe_u8_fast docnote).
    cells2 = jax.lax.optimization_barrier(cells)
    chi, clo = _nibble_onehots(cells2)

    luts16 = luts.reshape(b, tiles_y, tiles_x, 16, 16).astype(jnp.bfloat16)
    t0y, t1y = _neighbor_index_tables(tiles_y)
    t0x, t1x = _neighbor_index_tables(tiles_x)
    # Static tile->cell LUT gathers (tiny: [b, ncy, ncx, 16, 16] each).
    lut00 = luts16[:, t0y][:, :, t0x]
    lut01 = luts16[:, t0y][:, :, t1x]
    lut10 = luts16[:, t1y][:, :, t0x]
    lut11 = luts16[:, t1y][:, :, t1x]
    if not (isinstance(row0, int) and row0 == 0 and ncy_l == 2 * tiles_y):
        lut00 = lax.dynamic_slice_in_dim(lut00, row0, ncy_l, axis=1)
        lut01 = lax.dynamic_slice_in_dim(lut01, row0, ncy_l, axis=1)
        lut10 = lax.dynamic_slice_in_dim(lut10, row0, ncy_l, axis=1)
        lut11 = lax.dynamic_slice_in_dim(lut11, row0, ncy_l, axis=1)

    def eval_lut(lut):
        # [P,16]x[16,16] "matmul" + row-dot; XLA fuses both contractions into
        # one elementwise-reduce kernel (measured faster than a real MXU dot
        # at N=16 — no [P,16] intermediate ever hits HBM).
        t = jnp.einsum("bcdpi,bcdij->bcdpj", chi, lut, preferred_element_type=jnp.bfloat16)
        return jnp.einsum("bcdpj,bcdpj->bcdp", t, clo, preferred_element_type=jnp.float32)

    l00 = eval_lut(lut00)
    l01 = eval_lut(lut01)
    l10 = eval_lut(lut10)
    l11 = eval_lut(lut11)

    wx_tab = jnp.asarray(_blend_weights(hw))  # [2, hw]
    wy_tab = jnp.asarray(_blend_weights(hh))  # [2, hh]
    xa = wx_tab[jnp.arange(ncx) % 2]  # [ncx, hw]
    ya = wy_tab[(row0 + jnp.arange(ncy_l)) % 2]  # [ncy_loc, hh]
    xa_full = jnp.broadcast_to(xa[None, None, :, None, :], (b, ncy_l, ncx, hh, hw))
    ya_full = jnp.broadcast_to(ya[None, :, None, :, None], (b, ncy_l, ncx, hh, hw))
    xa_full = xa_full.reshape(b, ncy_l, ncx, hh * hw)
    ya_full = ya_full.reshape(b, ncy_l, ncx, hh * hw)

    # Same multiply arrangement as the gather-based reference so float rounding
    # at .5 ties matches it bit-for-bit.
    top = l00 * (1.0 - xa_full) + l01 * xa_full
    bot = l10 * (1.0 - xa_full) + l11 * xa_full
    out = jnp.clip(jnp.round(top * (1.0 - ya_full) + bot * ya_full), 0, 255).astype(jnp.int32)

    out = out.reshape(b, ncy_l, ncx, hh, hw).transpose(0, 1, 3, 2, 4)
    return out.reshape(b, ncy_l * hh, ncx * hw)


def _nibble_onehots(v: jnp.ndarray):
    """v uint8/int32 [..., P] -> (hi_oh, lo_oh) bf16 [..., P, 16]."""
    v = v.astype(jnp.int32)
    iota = jnp.arange(16, dtype=jnp.int32)
    hi = v >> 4
    lo = v & 15
    hi_oh = (hi[..., None] == iota).astype(jnp.bfloat16)
    lo_oh = (lo[..., None] == iota).astype(jnp.bfloat16)
    return hi_oh, lo_oh


def _neighbor_index_tables(tiles: int) -> tuple[np.ndarray, np.ndarray]:
    """For cell index c in [0, 2*tiles): the two neighbouring tile indices
    (floor and floor+1 of the interpolation coordinate), clipped."""
    c = np.arange(2 * tiles)
    t0 = np.clip((c - 1) // 2, 0, tiles - 1)
    t1 = np.clip((c - 1) // 2 + 1, 0, tiles - 1)
    return t0, t1


def _blend_weights(cell: int) -> np.ndarray:
    """[2, cell] fractional interpolation weight by (cell parity, offset):
    even cells sit in the upper half of a tile (weight 0.5..1), odd in the
    lower half (0..0.5). Matches txf = x/tile - 0.5 fractional parts."""
    u = np.arange(cell, dtype=np.float32)
    even = u / (2.0 * cell) + 0.5
    odd = u / (2.0 * cell)
    return np.stack([even, odd], axis=0)


@functools.partial(
    jax.jit, static_argnames=("clip_limit", "tiles_x", "tiles_y", "hist_subsample")
)
def clahe_u8_fast(
    img_u8: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """Drop-in replacement for clahe_u8 on cell-divisible shapes.

    `hist_subsample=s` (s in {1, 2, 4}) estimates each tile histogram from a
    within-cell s x s decimation of the pixels (the clip threshold and CDF
    scale follow the reduced tile area, so the LUT semantics are the OpenCV
    build applied to the decimated sample). A pure speed knob for the
    reduced-parity luma mode (ops/clahe_luma.py) — it trades exact-histogram
    parity for ~4x/16x less histogram work; s=1 is the exact default. On
    shapes that are not cell-divisible the exact clahe_u8 fallback runs and
    the knob is ignored (exact histograms are strictly higher fidelity)."""
    if hist_subsample < 1:
        raise ValueError(f"hist_subsample must be >= 1, got {hist_subsample}")
    squeeze = img_u8.ndim == 2
    if squeeze:
        img_u8 = img_u8[None]
    b, h, w = img_u8.shape
    if h % (2 * tiles_y) != 0 or w % (2 * tiles_x) != 0:
        out = clahe_u8(img_u8, clip_limit, tiles_x, tiles_y)
        return out[0] if squeeze else out

    # int32 through the cell transposes: fewer bytes (u8) measures *slower*
    # on this TPU generation (sublane-packed int8 relayouts), so stay wide.
    # One-hot nibbles are cheap to compute (32 compares/pixel) but HUGE to
    # store ([B,cells,P,16] bf16 ~ 0.5GB at 8x1080p). If the same one-hot
    # tensors fed both the histogram and the LUT-evaluation stages, XLA would
    # materialize them to HBM for the second consumer; the optimization
    # barrier inside _apply_from_cells makes each stage regenerate its
    # one-hots from the tiny cell tensor, so both stages fuse the compares
    # into their contractions and nothing one-hot-sized ever leaves VMEM
    # (measured ~2x end to end).
    ncy, ncx = 2 * tiles_y, 2 * tiles_x
    hh, hw = h // ncy, w // ncx
    v5 = img_u8.astype(jnp.int32).reshape(b, ncy, hh, ncx, hw)

    # ---- Stage 1: per-cell nibble outer products on the MXU -> tile hists ----
    hist, tile_area = _hist_from_cells(v5, hist_subsample)

    # ---- Stage 2: OpenCV clip/redistribute + CDF LUTs (tiny, exact) ----
    luts = _luts_from_hist(hist, clip_limit, tile_area)  # [b,ty,tx,256] int32

    # ---- Stage 3: per-cell LUT evaluation + separable bilinear blend ----
    out = _apply_from_cells(v5, luts, tiles_y, tiles_x)
    return out[0] if squeeze else out


def _luts_from_hist(hist: jnp.ndarray, clip_limit: float, tile_area: int) -> jnp.ndarray:
    """OpenCV clip/redistribute/CDF on precomputed histograms
    (same math as ops/clahe._tile_luts, which starts from raw pixels)."""
    clip = max(int(clip_limit * tile_area / HIST_SIZE), 1)
    bins = jnp.arange(HIST_SIZE, dtype=jnp.int32)
    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    redist = excess // HIST_SIZE
    residual = excess - redist * HIST_SIZE
    hist2 = clipped + redist
    step = jnp.maximum(HIST_SIZE // jnp.maximum(residual, 1), 1)
    gets_one = (bins % step == 0) & (bins // step < residual)
    hist3 = hist2 + gets_one.astype(jnp.int32)
    # cumsum as one MXU dot with a constant lower-triangular ones matrix:
    # XLA's lane-axis cumsum lowers to a relayout-heavy log-scan (measured as
    # the bulk of a 1.9 ms/batch tables stage at 1080p, perf_lab gdecomp);
    # cdf[e] = sum_{j<=e} hist3[j] is exact in f32 (values <= tile_area < 2^24).
    tri = jnp.asarray(
        np.tril(np.ones((HIST_SIZE, HIST_SIZE), np.float32), 0).T
    )  # [j, e]: 1 where j <= e
    # precision=HIGHEST: TPU default matmul precision truncates f32 operands to
    # bf16 on the MXU; post-redistribution bins can exceed 256 (a flat 1080p
    # tile yields ~379) which bf16 cannot represent, drifting the CDF/LUT 1-2
    # levels from OpenCV. The tri matrix is 0/1 and accumulation is f32, so
    # HIGHEST makes the contraction exact.
    cdf = jnp.einsum(
        "...j,je->...e", hist3.astype(jnp.float32), tri,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    lut_scale = float(HIST_SIZE - 1) / float(tile_area)
    return jnp.clip(jnp.round(cdf * lut_scale), 0, 255).astype(jnp.int32)
