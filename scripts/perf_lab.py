#!/usr/bin/env python3
"""Perf lab: throughput experiments for the classical CLAHE pipeline on TPU.

Each experiment is a named jitted function measured with the slope method
(BENCH_NOTES.md): K dispatches + one forced scalar fetch, slope between K=1
and K=9 cancels the axon tunnel RTT. Distinct inputs cycle to defeat
dispatch short-circuiting.

Usage: python scripts/perf_lab.py EXP [EXP...]   (or 'all')
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

H, W = 1088, 1920
TILES = 8
TH, TW = H // TILES, W // TILES          # 136 x 240
HH, HW = TH // 2, TW // 2                # 68 x 120
AREA = TH * TW                           # 32640
P = HH * HW                              # 8160
NCY, NCX = 2 * TILES, 2 * TILES

from retinex_tpu.ops.clahe import clahe_lab_rgb  # noqa: E402
from retinex_tpu.ops.clahe_fast import (  # noqa: E402
    _blend_weights,
    _luts_from_hist,
    _neighbor_index_tables,
    clahe_u8_fast,
)
from retinex_tpu.ops.colorspace import lab_u8_to_rgb, rgb_to_lab_u8  # noqa: E402

HIST_SIZE = 256


def _timed(fn, inputs, k):
    start = time.perf_counter()
    out = None
    for i in range(k):
        out = fn(inputs[i % len(inputs)])
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    return time.perf_counter() - start


def measure(name, fn, inputs, k_big=9, repeats=3, batch=None):
    _timed(fn, inputs, 1)  # compile+warm
    t1 = min(_timed(fn, inputs, 1) for _ in range(repeats))
    t2 = min(_timed(fn, inputs, k_big) for _ in range(repeats))
    dt = max((t2 - t1) / (k_big - 1), 1e-9)
    b = batch or inputs[0].shape[0]
    print(f"{name:36s} {dt * 1e3:8.2f} ms/batch  {b / dt:9.1f} fps", flush=True)
    return dt


def make_inputs(batch=8, n=4, dtype=np.float32):
    rng = np.random.default_rng(0)
    return [
        jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32) * 0.6, dtype=dtype)
        for _ in range(n)
    ]


def make_u8_inputs(batch=8, n=4):
    rng = np.random.default_rng(0)
    return [
        jnp.asarray(rng.integers(0, 256, (batch, H, W), dtype=np.uint8).astype(np.int32))
        for _ in range(n)
    ]


# ---------------- stage pieces (current implementation) ----------------


@jax.jit
def stage_fwd_colorspace(x):
    xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
    return jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)


@jax.jit
def stage_inv_colorspace(lab):
    rgb = lab_u8_to_rgb(lab.astype(jnp.float32))
    return jnp.round(rgb * 255.0) / 255.0


@jax.jit
def stage_clahe_u8(l_u8):
    return clahe_u8_fast(l_u8)


# ---------------- packed-K experiments ----------------


def _striped_onehots(v, dtype=jnp.bfloat16):
    """v int32 [..., q, 8] -> (hi128, lo128) one-hots [..., q, 128] where lane
    l = 16*s + i holds (nibble(v[..., s]) == i). Eight pixels share one
    128-wide K-row, so the MXU streams 8x fewer K-rows than a [P,16] layout."""
    lane = jnp.arange(128, dtype=jnp.int32)
    nib = lane % 16
    hi = jnp.repeat(v >> 4, 16, axis=-1)
    lo = jnp.repeat(v & 15, 16, axis=-1)
    return (hi == nib).astype(dtype), (lo == nib).astype(dtype)


@jax.jit
def hist_packed(l_u8):
    """Per-tile 256-bin histograms via the 8-pixel-per-K-row packing."""
    b = l_u8.shape[0]
    v = l_u8.astype(jnp.int32)
    tiles = (
        v.reshape(b, TILES, TH, TILES, TW).transpose(0, 1, 3, 2, 4).reshape(b, TILES, TILES, AREA)
    )
    q8 = tiles.reshape(b, TILES, TILES, AREA // 8, 8)
    A, B = _striped_onehots(q8)
    C = jnp.einsum("btxqk,btxql->btxkl", A, B, preferred_element_type=jnp.float32)
    C6 = C.reshape(b, TILES, TILES, 8, 16, 8, 16)
    hist16 = jnp.einsum("btxsisj->btxij", C6)
    return hist16.reshape(b, TILES, TILES, HIST_SIZE).astype(jnp.int32)


@jax.jit
def hist_current(l_u8):
    """Round-1 per-cell nibble outer products (for comparison)."""
    b = l_u8.shape[0]
    v = l_u8.astype(jnp.int32)
    cells = v.reshape(b, NCY, HH, NCX, HW).transpose(0, 1, 3, 2, 4).reshape(b, NCY, NCX, P)
    iota = jnp.arange(16, dtype=jnp.int32)
    hi_oh = ((cells >> 4)[..., None] == iota).astype(jnp.bfloat16)
    lo_oh = ((cells & 15)[..., None] == iota).astype(jnp.bfloat16)
    cell_hist = jnp.einsum("bcdpi,bcdpj->bcdij", hi_oh, lo_oh, preferred_element_type=jnp.float32)
    hist16 = cell_hist.reshape(b, TILES, 2, TILES, 2, 16, 16).sum(axis=(2, 4))
    return hist16.reshape(b, TILES, TILES, HIST_SIZE).astype(jnp.int32)


def _block_diag_lut(lut16):
    """lut16 [..., 16, 16] -> [..., 128, 128] with the LUT on each of the 8
    diagonal 16x16 blocks (built elementwise so XLA fuses it into the dot)."""
    lane = jnp.arange(128, dtype=jnp.int32)
    si, sj = lane[:, None] // 16, lane[None, :] // 16
    ii, jj = lane[:, None] % 16, lane[None, :] % 16
    block = lut16[..., ii, jj]  # [..., 128, 128] gather of a tiny tensor
    return jnp.where(si == sj, block, 0.0)


@jax.jit
def apply_packed(l_u8, luts):
    """LUT application via block-diagonal [128,128] MXU dots.

    l_u8: [b,H,W] int32; luts: [b,TILES,TILES,256] int32 -> [b,H,W] int32."""
    b = l_u8.shape[0]
    v = l_u8.astype(jnp.int32)
    cells = v.reshape(b, NCY, HH, NCX, HW).transpose(0, 1, 3, 2, 4).reshape(b, NCY, NCX, P)
    q8 = cells.reshape(b, NCY, NCX, P // 8, 8)
    A, B = _striped_onehots(q8)

    luts16 = luts.reshape(b, TILES, TILES, 16, 16).astype(jnp.bfloat16)
    t0y, t1y = _neighbor_index_tables(TILES)
    t0x, t1x = _neighbor_index_tables(TILES)
    lut00 = luts16[:, t0y][:, :, t0x]
    lut01 = luts16[:, t0y][:, :, t1x]
    lut10 = luts16[:, t1y][:, :, t0x]
    lut11 = luts16[:, t1y][:, :, t1x]

    def eval_lut(lut):
        bd = _block_diag_lut(lut)  # [b,ncy,ncx,128,128]
        t = jnp.einsum("bcdqk,bcdkl->bcdql", A, bd, preferred_element_type=jnp.bfloat16)
        prod = (t * B).reshape(b, NCY, NCX, P // 8, 8, 16)
        return jnp.sum(prod, axis=-1, dtype=jnp.float32)  # [b,ncy,ncx,q,8]

    l00 = eval_lut(lut00)
    l01 = eval_lut(lut01)
    l10 = eval_lut(lut10)
    l11 = eval_lut(lut11)

    wx_tab = jnp.asarray(_blend_weights(HW))
    wy_tab = jnp.asarray(_blend_weights(HH))
    xa = wx_tab[jnp.arange(NCX) % 2]  # [ncx, hw]
    ya = wy_tab[jnp.arange(NCY) % 2]  # [ncy, hh]
    xa_full = jnp.broadcast_to(xa[None, None, :, None, :], (b, NCY, NCX, HH, HW))
    ya_full = jnp.broadcast_to(ya[None, :, None, :, None], (b, NCY, NCX, HH, HW))
    xa_full = xa_full.reshape(b, NCY, NCX, P // 8, 8)
    ya_full = ya_full.reshape(b, NCY, NCX, P // 8, 8)

    top = l00 * (1.0 - xa_full) + l01 * xa_full
    bot = l10 * (1.0 - xa_full) + l11 * xa_full
    out = jnp.clip(jnp.round(top * (1.0 - ya_full) + bot * ya_full), 0, 255).astype(jnp.int32)
    out = out.reshape(b, NCY, NCX, HH, HW).transpose(0, 1, 3, 2, 4)
    return out.reshape(b, H, W)


@functools.partial(jax.jit, static_argnames=("clip_limit",))
def clahe_u8_packed(l_u8, clip_limit: float = 2.0):
    hist = hist_packed(l_u8)
    l2 = jax.lax.optimization_barrier(l_u8)
    luts = _luts_from_hist(hist, clip_limit, AREA)
    return apply_packed(l2, luts)


@jax.jit
def pipeline_packed(x):
    """Full pipeline with packed hist + packed apply."""
    xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
    lab = jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)
    l_eq = clahe_u8_packed(lab[..., 0].astype(jnp.int32))
    lab_eq = jnp.stack(
        [
            l_eq.astype(jnp.float32),
            lab[..., 1].astype(jnp.float32),
            lab[..., 2].astype(jnp.float32),
        ],
        axis=-1,
    )
    rgb = lab_u8_to_rgb(lab_eq)
    return jnp.round(rgb * 255.0) / 255.0


EXPERIMENTS = {}


def exp(name):
    def deco(fn):
        EXPERIMENTS[name] = fn
        return fn

    return deco


@exp("base")
def run_base():
    inputs = make_inputs()
    measure("pipeline_current(XLA)", jax.jit(clahe_lab_rgb), inputs)


@exp("stages")
def run_stages():
    inputs = make_inputs()
    lab = [stage_fwd_colorspace(x) for x in inputs]
    l_u8 = [la[..., 0].astype(jnp.int32) for la in lab]
    measure("fwd_colorspace", stage_fwd_colorspace, inputs)
    measure("clahe_u8_fast(hist+apply)", stage_clahe_u8, l_u8)
    measure("inv_colorspace", stage_inv_colorspace, lab)


@exp("hist")
def run_hist():
    l_u8 = make_u8_inputs()
    a = hist_current(l_u8[0])
    b = hist_packed(l_u8[0])
    ok = bool(jnp.all(a == b))
    print(f"hist_packed == hist_current: {ok}")
    measure("hist_current", hist_current, l_u8)
    measure("hist_packed", hist_packed, l_u8)


@exp("apply")
def run_apply():
    l_u8 = make_u8_inputs()
    want = [clahe_u8_fast(v) for v in l_u8]
    got = [clahe_u8_packed(v) for v in l_u8]
    diff = max(float(jnp.max(jnp.abs(w - g))) for w, g in zip(want, got))
    print(f"clahe_u8_packed vs clahe_u8_fast max diff: {diff}")
    measure("clahe_u8_fast (full)", stage_clahe_u8, l_u8)
    measure("clahe_u8_packed (full)", clahe_u8_packed, l_u8)


@exp("pipeline")
def run_pipeline():
    inputs = make_inputs()
    want = clahe_lab_rgb(inputs[0])
    got = pipeline_packed(inputs[0])
    diff = float(jnp.max(jnp.abs(want - got)))
    print(f"pipeline_packed vs current max diff: {diff * 255.0:.2f}/255")
    measure("pipeline_current(XLA)", jax.jit(lambda v: clahe_lab_rgb(v, use_pallas=False)), inputs)
    measure("pipeline_packed", pipeline_packed, inputs)


@exp("gather")
def run_gather():
    from retinex_tpu.ops.clahe_gather import clahe_lab_rgb_gather, clahe_rgb_u8_gather

    inputs = make_inputs()
    inputs_u8 = [
        jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8) for x in inputs
    ]
    want = np.asarray(jax.jit(lambda v: clahe_lab_rgb(v, use_pallas=False))(inputs[0]))
    got = np.asarray(clahe_lab_rgb_gather(inputs[0]))
    d = np.abs(want - got) * 255.0
    print(f"gather vs current: max {d.max():.2f} levels, >0.5 frac {(d > 0.5).mean():.2e}")
    from retinex_tpu.ops.clahe_gather import clahe_rgb_u8_planar_gather

    inputs_planar = [jnp.transpose(v, (0, 3, 1, 2)) for v in inputs_u8]
    measure("pipeline_current(XLA)", jax.jit(lambda v: clahe_lab_rgb(v, use_pallas=False)), inputs)
    measure("pipeline_gather_f32", clahe_lab_rgb_gather, inputs)
    measure("pipeline_gather_u8", clahe_rgb_u8_gather, inputs_u8)
    measure("pipeline_gather_u8_planar", clahe_rgb_u8_planar_gather, inputs_planar)


@exp("gather_stages")
def run_gather_stages():
    import retinex_tpu.ops.clahe_gather as cg

    inputs = make_inputs()
    sp = -(-P // 128)

    @jax.jit
    def prefix(x):
        xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
        lab = jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)
        lab_cells = cg._cellize_u8(lab, TILES, TILES, sp)
        hist = cg._hist_from_cells(lab_cells[:, :, :, 0], TILES, TILES, P)
        luts = _luts_from_hist(hist, 2.0, AREA).astype(jnp.float32)
        luts16 = luts.reshape(8, TILES, TILES, 256)
        t0y, t1y = _neighbor_index_tables(TILES)
        t0x, t1x = _neighbor_index_tables(TILES)
        lut4 = jnp.stack(
            [
                luts16[:, t0y][:, :, t0x],
                luts16[:, t0y][:, :, t1x],
                luts16[:, t1y][:, :, t0x],
                luts16[:, t1y][:, :, t1x],
            ],
            axis=3,
        ).reshape(8, NCY, NCX, 4, 2, 128)
        return lab_cells, lut4

    @jax.jit
    def cellize_only(x):
        xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
        lab = jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)
        return cg._cellize_u8(lab, TILES, TILES, sp)

    pre = [prefix(x) for x in inputs]
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    group = 16
    hh, hw = HH, HW

    @jax.jit
    def kernel_only(args):
        lab_cells, lut4 = args
        wx = cg.jnp.asarray(np.pad(_blend_weights(hw), ((0, 0), (0, 128 - hw))))
        wy = cg.jnp.asarray(np.pad(_blend_weights(hh), ((0, 0), (0, 128 - hh))))
        return pl.pallas_call(
            ft.partial(cg._apply_kernel, sp, hh, hw, group),
            grid=(8, NCY, NCX // group),
            in_specs=[
                pl.BlockSpec((None, None, group, 3, sp, 128), lambda i, j, k: (i, j, k, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, group, 4, 2, 128), lambda i, j, k: (i, j, k, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, None, group, 3, sp, 128), lambda i, j, k: (i, j, k, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, NCY, NCX, 3, sp, 128), jnp.float32),
        )(lab_cells, lut4, wx, wy)

    cells_out = [kernel_only(p) for p in pre]

    @jax.jit
    def decellize_only(c):
        return cg._decellize(c, H, W)

    measure("gather: cellize+colorspace", cellize_only, inputs)
    measure("gather: XLA prefix (cell+hist+lut)", prefix, inputs)
    measure("gather: pallas kernel", kernel_only, pre, batch=8)
    measure("gather: decellize", decellize_only, cells_out)


@exp("gather2")
def run_gather2():
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import retinex_tpu.ops.clahe_gather as cg

    inputs = make_inputs()
    hh, hw = HH, HW
    n_chunks = -(-256 // hw)

    @jax.jit
    def prefix(x):
        xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
        lab = jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)
        labp = lab.transpose(0, 3, 1, 2)
        hist = cg._hist_planar(labp[:, 0], TILES, TILES)
        luts = _luts_from_hist(hist, 2.0, AREA).astype(jnp.float32)
        luts16 = luts.reshape(8, TILES, TILES, 256)
        t0y, t1y = _neighbor_index_tables(TILES)
        t0x, t1x = _neighbor_index_tables(TILES)
        lut4 = jnp.stack(
            [luts16[:, t0y][:, :, t0x], luts16[:, t0y][:, :, t1x],
             luts16[:, t1y][:, :, t0x], luts16[:, t1y][:, :, t1x]], axis=2)
        pad = n_chunks * hw - 256
        lut4 = jnp.pad(lut4, ((0, 0),) * 4 + ((0, pad),))
        lane_luts = lut4.reshape(8, NCY, 4, NCX, n_chunks, hw).transpose(0, 1, 2, 4, 3, 5)
        return labp.reshape(8, 3, NCY, HH, NCX, HW), lane_luts

    @jax.jit
    def fwd_planar_only(x):
        xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
        lab = jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)
        return lab.transpose(0, 3, 1, 2)

    pre = [prefix(x) for x in inputs]
    wx = _blend_weights(hw)
    wy = _blend_weights(hh)
    xa_tab = jnp.asarray(wx[np.arange(NCX) % 2])
    ya_tab = jnp.asarray(np.ascontiguousarray(wy.T))

    @jax.jit
    def kernel_only(args):
        labp6, lane_luts = args
        return pl.pallas_call(
            ft.partial(cg._apply_kernel, hh, hw, n_chunks),
            grid=(8, NCY),
            in_specs=[
                pl.BlockSpec((None, 3, None, hh, NCX, hw), lambda i, j: (i, 0, j, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, 4, n_chunks, NCX, hw), lambda i, j: (i, j, 0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NCX, hw), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((hh, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, 3, None, hh, NCX, hw), lambda i, j: (i, 0, j, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 3, NCY, hh, NCX, hw), jnp.float32),
        )(labp6, lane_luts, xa_tab, ya_tab)

    cells_out = [kernel_only(p) for p in pre]

    @jax.jit
    def post(c):
        return c.reshape(8, 3, H, W).transpose(0, 2, 3, 1)

    measure("g2: fwd colorspace->planar", fwd_planar_only, inputs)
    measure("g2: XLA prefix total", prefix, inputs)
    measure("g2: pallas kernel", kernel_only, pre, batch=8)
    measure("g2: final transpose", post, cells_out)

    # diff distribution vs current on TPU
    want = np.asarray(jax.jit(lambda v: clahe_lab_rgb(v, use_pallas=False))(inputs[0]))
    from retinex_tpu.ops.clahe_gather import clahe_lab_rgb_gather

    got = np.asarray(clahe_lab_rgb_gather(inputs[0]))
    d = np.abs(want - got) * 255.0
    print("diff histogram:", [(t, int((d > t).sum())) for t in (0.5, 1.5, 2.5, 4.5, 6.5)])
    ys, xs = np.nonzero(d.max(axis=(0, 3)) > 2.5)[0][:5], np.nonzero(d.max(axis=(0, 3)) > 2.5)[1][:5]
    for y, x in zip(ys, xs):
        b_i = int(np.argmax(d[:, y, x].max(axis=-1)))
        print(f"  big diff at b={b_i} y={y} x={x}: want {want[b_i, y, x] * 255}, got {got[b_i, y, x] * 255}")


@exp("hist2")
def run_hist2():
    import retinex_tpu.ops.clahe_gather as cg

    rng = np.random.default_rng(0)
    u8 = [jnp.asarray(rng.integers(0, 256, (8, H, W), dtype=np.uint8)) for _ in range(4)]
    i32 = [v.astype(jnp.int32) for v in u8]

    @jax.jit
    def hist_u8(v):
        return cg._hist_planar(v, TILES, TILES)

    @jax.jit
    def hist_i32_in(v):
        return cg._hist_planar(v, TILES, TILES)

    @jax.jit
    def hist_int8(l_u8):
        b = l_u8.shape[0]
        th, tw = H // TILES, W // TILES
        v = l_u8.astype(jnp.int32)
        tiles = (
            v.reshape(b, TILES, th, TILES, tw).transpose(0, 1, 3, 2, 4).reshape(b, TILES, TILES, th * tw)
        )
        iota = jnp.arange(16, dtype=jnp.int32)
        hi_oh = ((tiles >> 4)[..., None] == iota).astype(jnp.int8)
        lo_oh = ((tiles & 15)[..., None] == iota).astype(jnp.int8)
        hist16 = jnp.einsum("btxpi,btxpj->btxij", hi_oh, lo_oh, preferred_element_type=jnp.int32)
        return hist16.reshape(b, TILES, TILES, 256)

    @jax.jit
    def hist_transpose_first(l_u8):
        b = l_u8.shape[0]
        th, tw = H // TILES, W // TILES
        tiles = (
            l_u8.reshape(b, TILES, th, TILES, tw).transpose(0, 1, 3, 2, 4).reshape(b, TILES, TILES, th * tw)
        ).astype(jnp.int32)
        iota = jnp.arange(16, dtype=jnp.int32)
        hi_oh = ((tiles >> 4)[..., None] == iota).astype(jnp.bfloat16)
        lo_oh = ((tiles & 15)[..., None] == iota).astype(jnp.bfloat16)
        hist16 = jnp.einsum("btxpi,btxpj->btxij", hi_oh, lo_oh, preferred_element_type=jnp.float32)
        return hist16.reshape(b, TILES, TILES, 256).astype(jnp.int32)

    a = hist_u8(u8[0]); b_ = hist_int8(u8[0])
    print("int8 == bf16:", bool(jnp.all(a == b_)))
    measure("hist_planar(u8 in)", hist_u8, u8)
    measure("hist_planar(i32 in)", hist_i32_in, i32)
    measure("hist int8 MXU", hist_int8, u8)
    measure("hist transpose-first", hist_transpose_first, u8)


@exp("prefix2")
def run_prefix2():
    import retinex_tpu.ops.clahe_gather as cg

    rng = np.random.default_rng(0)
    u8 = [
        jnp.asarray(rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)) for _ in range(4)
    ]
    hh, hw = HH, HW
    n_chunks = 3

    @jax.jit
    def fwd_nhwc_then_transpose(x_u8):
        xq = x_u8.astype(jnp.float32) / 255.0
        lab = jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)
        return lab.transpose(0, 3, 1, 2)

    @jax.jit
    def fwd_transpose_then_planar(x_u8):
        xp = x_u8.transpose(0, 3, 1, 2).astype(jnp.float32) / 255.0
        from retinex_tpu.ops.colorspace import _RGB2XYZ, _XN, _ZN, _lab_f, srgb_to_linear

        r = srgb_to_linear(xp[:, 0])
        g = srgb_to_linear(xp[:, 1])
        b_ = srgb_to_linear(xp[:, 2])
        m = _RGB2XYZ
        X = (m[0, 0] * r + m[0, 1] * g + m[0, 2] * b_) / _XN
        Y = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b_
        Z = (m[2, 0] * r + m[2, 1] * g + m[2, 2] * b_) / _ZN
        fx, fy, fz = _lab_f(X), _lab_f(Y), _lab_f(Z)
        L8 = (116.0 * fy - 16.0) * (255.0 / 100.0)
        a8 = 500.0 * (fx - fy) + 128.0
        b8 = 200.0 * (fy - fz) + 128.0
        lab = jnp.stack([L8, a8, b8], axis=1)
        return jnp.clip(jnp.round(lab), 0, 255).astype(jnp.uint8)

    labp = [fwd_nhwc_then_transpose(x) for x in u8]
    a = fwd_transpose_then_planar(u8[0])
    print("planar-first == nhwc-first:", bool(jnp.all(a == labp[0])))

    @jax.jit
    def tables_f32(lp):
        hist = cg._hist_planar(lp[:, 0], TILES, TILES)
        luts = _luts_from_hist(hist, 2.0, AREA).astype(jnp.float32)
        luts16 = luts.reshape(8, TILES, TILES, 256)
        t0y, t1y = _neighbor_index_tables(TILES)
        t0x, t1x = _neighbor_index_tables(TILES)
        lut4 = jnp.stack(
            [luts16[:, t0y][:, :, t0x], luts16[:, t0y][:, :, t1x],
             luts16[:, t1y][:, :, t0x], luts16[:, t1y][:, :, t1x]], axis=2)
        lut4 = jnp.pad(lut4, ((0, 0),) * 4 + ((0, n_chunks * hw - 256),))
        return lut4.reshape(8, NCY, 4, NCX, n_chunks, hw).transpose(0, 1, 2, 4, 3, 5)

    @jax.jit
    def hist_only(lp):
        return cg._hist_planar(lp[:, 0], TILES, TILES)

    hists = [hist_only(lp) for lp in labp]

    @jax.jit
    def tables_from_hist(hist):
        luts = _luts_from_hist(hist, 2.0, AREA).astype(jnp.float32)
        luts16 = luts.reshape(8, TILES, TILES, 256)
        t0y, t1y = _neighbor_index_tables(TILES)
        t0x, t1x = _neighbor_index_tables(TILES)
        lut4 = jnp.stack(
            [luts16[:, t0y][:, :, t0x], luts16[:, t0y][:, :, t1x],
             luts16[:, t1y][:, :, t0x], luts16[:, t1y][:, :, t1x]], axis=2)
        lut4 = jnp.pad(lut4, ((0, 0),) * 4 + ((0, n_chunks * hw - 256),))
        return lut4.reshape(8, NCY, 4, NCX, n_chunks, hw).transpose(0, 1, 2, 4, 3, 5)

    measure("fwd nhwc->lab->transpose", fwd_nhwc_then_transpose, u8)
    measure("fwd transpose->planar lab", fwd_transpose_then_planar, u8)
    measure("hist only", hist_only, labp)
    measure("tables from hist", tables_from_hist, hists)
    measure("hist+tables", tables_f32, labp)


@exp("gdecomp")
def run_gdecomp():
    """Current-pipeline stage decomposition via the module's stage functions."""
    import retinex_tpu.ops.clahe_gather as cg

    rng = np.random.default_rng(0)
    b = 8
    xs = [jnp.asarray(rng.random((b, H, W, 3), dtype=np.float32) * 0.4) for _ in range(4)]
    u8n = [jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8) for x in xs]
    xp = [v.transpose(0, 3, 1, 2) for v in u8n]
    rgb6 = [v.reshape(b, 3, NCY, HH, NCX, HW) for v in xp]

    @jax.jit
    def quantize_f32(x):
        return jnp.clip(jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)

    @jax.jit
    def entry_transpose(v):
        return v.transpose(0, 3, 1, 2)

    @jax.jit
    def fwd_only(r6):
        return cg._fwd_stage(r6)

    labs = [fwd_only(r) for r in rgb6]

    @jax.jit
    def tables_only(l6):
        return cg._tables_stage(l6[0], 2.0, TILES, TILES, AREA)

    luts = [tables_only(l) for l in labs]

    @jax.jit
    def apply_only(args):
        l6, lt = args
        return cg._apply_stage(l6, lt)

    outs = [apply_only(a) for a in zip(labs, luts)]

    @jax.jit
    def exit_transpose(rp):
        return rp.reshape(b, 3, H, W).transpose(0, 2, 3, 1)

    @jax.jit
    def dequant(rp):
        return rp.reshape(b, 3, H, W).transpose(0, 2, 3, 1).astype(jnp.float32) / 255.0

    measure("quantize f32->u8 (nhwc)", quantize_f32, xs)
    measure("entry transpose nhwc->planar", entry_transpose, u8n)
    measure("fwd kernel", fwd_only, rgb6)
    measure("tables (hist+lut+pack)", tables_only, labs)
    measure("apply kernel", apply_only, list(zip(labs, luts)), batch=8)
    measure("exit transpose planar->nhwc", exit_transpose, outs)
    measure("dequant to f32 nhwc", dequant, outs)


@exp("batchscale")
def run_batchscale():
    from retinex_tpu.ops.clahe_gather import clahe_rgb_u8_gather

    rng = np.random.default_rng(0)
    for batch in (8, 16, 32):
        u8 = [
            jnp.asarray(rng.integers(0, 256, (batch, H, W, 3), dtype=np.uint8))
            for _ in range(3)
        ]
        measure(f"gather_u8 batch={batch}", clahe_rgb_u8_gather, u8, batch=batch)


@exp("decomp")
def run_decomp():
    """Stage split of the CURRENT clahe_gather pipeline (packed-LUT apply)."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import retinex_tpu.ops.clahe_gather as cg
    from retinex_tpu.ops.colorspace import srgb_to_linear

    rng = np.random.default_rng(0)
    u8 = [
        jnp.asarray(rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)) for _ in range(4)
    ]
    hh, hw = HH, HW
    b = 8

    def fwd(x_u8):
        rgb6 = x_u8.transpose(0, 3, 1, 2).reshape(b, 3, NCY, hh, NCX, hw)
        dg_tab = srgb_to_linear(jnp.arange(256, dtype=jnp.float32) / 255.0).reshape(2, 128)
        return pl.pallas_call(
            ft.partial(cg._fwd_kernel, hh, hw),
            grid=(b, NCY),
            in_specs=[
                pl.BlockSpec((None, 3, None, hh, NCX, hw), lambda i, j: (i, 0, j, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, None, None, hh, NCX, hw), lambda i, j: (0, i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, b, NCY, hh, NCX, hw), jnp.uint8),
        )(rgb6, dg_tab)

    def tables(lab6):
        hist = cg._hist_planar(lab6[0].reshape(b, H, W), TILES, TILES)
        luts = _luts_from_hist(hist, 2.0, AREA).astype(jnp.float32)
        luts16 = luts.reshape(b, TILES, TILES, 256)
        t0y, t1y = _neighbor_index_tables(TILES)
        t0x, t1x = _neighbor_index_tables(TILES)
        lut4 = jnp.stack(
            [luts16[:, t0y][:, :, t0x], luts16[:, t0y][:, :, t1x],
             luts16[:, t1y][:, :, t0x], luts16[:, t1y][:, :, t1x]], axis=2).astype(jnp.int32)
        packed = lut4[:, :, 0] | (lut4[:, :, 1] << 8) | (lut4[:, :, 2] << 16) | (lut4[:, :, 3] << 24)
        return packed.reshape(b, NCY, NCX, 2, 128).transpose(0, 1, 3, 2, 4)

    wx = _blend_weights(hw)
    wy = _blend_weights(hh)
    xa_tab = jnp.asarray(wx[np.arange(NCX) % 2])
    ya_tab = jnp.asarray(np.ascontiguousarray(wy.T))

    def apply_k(lab6, lane_luts):
        return pl.pallas_call(
            ft.partial(cg._apply_kernel, hh, hw),
            grid=(b, NCY),
            in_specs=[
                pl.BlockSpec((3, None, None, hh, NCX, hw), lambda i, j: (0, i, j, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, 2, NCX, 128), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NCX, hw), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((hh, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, 3, None, hh, NCX, hw), lambda i, j: (i, 0, j, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 3, NCY, hh, NCX, hw), jnp.uint8),
        )(lab6, lane_luts, xa_tab, ya_tab)

    def post(rgbp):
        return rgbp.reshape(b, 3, H, W).transpose(0, 2, 3, 1)

    @jax.jit
    def hist_only(lab6):
        return cg._hist_planar(lab6[0].reshape(b, H, W), TILES, TILES)

    measure("A fwd only", jax.jit(fwd), u8)
    measure("B fwd+tables", jax.jit(lambda x: tables(fwd(x))), u8)
    lab6s = [jax.jit(fwd)(x) for x in u8]
    lts = [jax.jit(tables)(l) for l in lab6s]
    measure("B1 hist only", hist_only, lab6s)
    measure("B2 tables only", jax.jit(tables), lab6s)
    measure("C apply only", jax.jit(lambda a: apply_k(*a)), list(zip(lab6s, lts)), batch=8)
    measure("D apply+post", jax.jit(lambda a: post(apply_k(*a))), list(zip(lab6s, lts)), batch=8)
    measure(
        "E full",
        jax.jit(lambda x: post(apply_k(fwd(x), tables(fwd(x))))),
        u8,
    )

    def full_barriers(x):
        lab6 = jax.lax.optimization_barrier(fwd(x))
        lts_ = jax.lax.optimization_barrier(tables(lab6))
        return post(apply_k(lab6, lts_))

    measure("E2 full+barriers", jax.jit(full_barriers), u8)


@exp("fusedblocks")
def run_fusedblocks():
    """Standalone fused FAM / dec1 kernels vs their XLA chains."""
    from retinex_tpu.ops.fused_blocks import dec1_chain, fam_dual_conv3
    from jax import lax

    rng = np.random.default_rng(0)
    B, Hp, Wp = 2, 544, 960
    x = [jnp.asarray(rng.standard_normal((B, Hp, Wp, 128)) * 0.2, jnp.bfloat16) for _ in range(3)]
    k1 = jnp.asarray(rng.standard_normal((3, 3, 128, 256)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    k2a = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    b2a = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    k2b = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    b2b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)

    def conv(v, k, b, pad=1):
        out = lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b.astype(out.dtype)

    @jax.jit
    def fam_xla(v):
        y = jax.nn.relu(conv(v, k1, b1))
        return jnp.concatenate(
            [conv(y[..., :128], k2a, b2a), conv(y[..., 128:], k2b, b2b)], axis=-1)

    f_fused = jax.jit(lambda v: fam_dual_conv3(v, k1, b1, k2a, b2a, k2b, b2b))
    want = np.asarray(fam_xla(x[0]), np.float32)
    got = np.asarray(f_fused(x[0]), np.float32)
    print(f"fam fused vs xla: max {np.abs(want-got).max():.4f} scale {np.abs(want).max():.1f}")
    gf = 2 * B * Hp * Wp * 9 * 128 * 512 / 1e9
    d1 = measure("fam chains XLA", fam_xla, x, batch=B)
    d2 = measure("fam chains fused", f_fused, x, batch=B)
    print(f"  {gf:.0f} GF: xla {gf/d1/1e3:.1f} TF/s, fused {gf/d2/1e3:.1f} TF/s")

    d2in = [jnp.asarray(rng.standard_normal((B, Hp, Wp, 64)) * 0.3, jnp.bfloat16) for _ in range(3)]
    x1p = jnp.asarray(np.abs(rng.standard_normal((B, Hp, Wp, 128))) * 0.2, jnp.bfloat16)
    ku = jnp.asarray(rng.standard_normal((1, 1, 64, 128)) * 0.1, jnp.float32)
    bu = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    ks = [jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32) for _ in range(3)]
    bs = [jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32) for _ in range(3)]

    @jax.jit
    def dec1_xla(args):
        v, res = args
        y = conv(v, ku, bu, pad=0)
        y = jax.nn.relu(conv(y, ks[0], bs[0]))
        y = jax.nn.relu(conv(y, ks[1], bs[1])) + res
        return jax.nn.relu(conv(y, ks[2], bs[2]))

    f_dec = jax.jit(
        lambda args: dec1_chain(args[0], args[1], ku, bu, ks[0], bs[0], ks[1], bs[1], ks[2], bs[2])
    )
    pairs = [(v, x1p) for v in d2in]
    want = np.asarray(dec1_xla(pairs[0]), np.float32)
    got = np.asarray(f_dec(pairs[0]), np.float32)
    print(f"dec1 fused vs xla: max {np.abs(want-got).max():.4f} scale {np.abs(want).max():.1f}")
    measure("dec1 chain XLA", dec1_xla, pairs, batch=B)
    measure("dec1 chain fused", f_dec, pairs, batch=B)


@exp("famparts")
def run_famparts():
    """Where do the FAM's non-conv ~23 ms go? Bisect maxpool/fusion/CA/SA."""
    import os

    from retinex_tpu.models.packed_inference import PackedRetinex, _conv, _conv_auto, _tile4
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
    from retinex_tpu.ops.s2d import maxpool3x3_s1_s2d

    B, Hp, Wp = int(os.environ.get("RETINEX_PERF_BATCH", "2")), 544, 960
    dtype = jnp.bfloat16
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    pk = PackedRetinex(model, variables)
    rng = np.random.default_rng(0)
    xps = [jnp.asarray(rng.standard_normal((B, Hp, Wp, 128)) * 0.2, dtype) for _ in range(3)]

    @jax.jit
    def fam_full(v):
        return pk._fam_packed(v, pk.fam1)

    @jax.jit
    def b1b2_only(v):
        b1 = _conv_auto(v, pk.fam1["k"]["branch1"], bias=pk.fam1["b"]["branch1"])
        b2 = maxpool3x3_s1_s2d(v)
        b2 = _conv_auto(b2, pk.fam1["k"]["branch2_conv"], bias=pk.fam1["b"]["branch2_conv"])
        return b1, b2

    @jax.jit
    def maxpool_only(v):
        return maxpool3x3_s1_s2d(v)

    # tail: branches -> fusion sum -> CA -> SA -> out
    fours = [
        (
            b1b2_only(v)[0], b1b2_only(v)[1],
            jnp.roll(v, 1, axis=-1), jnp.roll(v, 2, axis=-1),
        )
        for v in xps
    ]

    @jax.jit
    def tail_only(args):
        b1, b2, b3, b4 = args
        kf = pk.fam1["parts"]
        out = jax.nn.relu(
            _conv(b1, kf[0]) + _conv(b2, kf[1]) + _conv(b3, kf[2]) + _conv(b4, kf[3])
            + _tile4(pk.fam1["b"]["fusion"]).astype(b1.dtype)
        )
        c = 32
        bsz = out.shape[0]
        gap = out.mean(axis=(1, 2)).reshape(bsz, 4, c).mean(axis=1)[:, None, None, :]
        ca = _conv(gap, pk.fam1["ca"]["ca_reduce"]["kernel"], pk.fam1["ca"]["ca_reduce"]["bias"])
        ca = jax.nn.relu(ca)
        ca = _conv(ca, pk.fam1["ca"]["ca_expand"]["kernel"], pk.fam1["ca"]["ca_expand"]["bias"])
        ca = jax.nn.sigmoid(ca)
        out = out * _tile4(ca).astype(out.dtype)
        b_, hh, ww, _ = out.shape
        blocks = out.reshape(b_, hh, ww, 4, c)
        avg_map = blocks.mean(axis=-1)
        max_map = blocks.max(axis=-1)
        sa_in = jnp.stack([avg_map, max_map], axis=-1).reshape(b_, hh, ww, 8)
        sa = jax.nn.sigmoid(_conv_auto(sa_in, pk.fam1["k"]["sa_conv"], bias=pk.fam1["b"]["sa_conv"]))
        return (blocks * sa[..., None]).reshape(b_, hh, ww, 4 * c)

    measure("fam full (auto)", fam_full, xps, batch=B)
    from retinex_tpu.models.packed_inference import NetCfg

    pk_xla = PackedRetinex(
        model, variables, NetCfg(fam_conv_fused=False, fam_tail_fold=False)
    )

    @jax.jit
    def fam_full_xla(v):
        return pk_xla._fam_packed(v, pk_xla.fam1)

    measure("fam full (xla chains)", fam_full_xla, xps, batch=B)

    pk_fused = PackedRetinex(
        model, variables, NetCfg(fam_fused_max_batch=99, fam_tail_fold=False)
    )

    @jax.jit
    def fam_full_fused(v):
        return pk_fused._fam_packed(v, pk_fused.fam1)

    measure("fam full (fused kernel)", fam_full_fused, xps, batch=B)

    from retinex_tpu.ops.fused_blocks import fam_conv_fused as _fcf

    @jax.jit
    def famconv_kernel_only(v):
        fw = pk.fam1
        return _fcf(
            v, fw["ka"], fw["kb"], fw["dual_k1"], fw["dual_b1"],
            fw["k32f"], fw["k42f"], fw["bias_total"],
        )

    measure("famconv kernel only", famconv_kernel_only, xps, batch=B)
    measure("fam maxpool only", maxpool_only, xps, batch=B)
    measure("fam b1+b2", b1b2_only, xps, batch=B)
    measure("fam tail (fusion+CA+SA)", tail_only, fours, batch=B)


@exp("conv")
def run_conv():
    from jax import lax

    from retinex_tpu.ops.conv_pallas import conv2d_pallas

    rng = np.random.default_rng(0)
    # Packed full-res net shape: batch 2, 544x960, 128ch, bf16
    for (bsz, hh, ww, cin, cout, kh) in [
        (2, 544, 960, 128, 128, 3),
        (2, 544, 960, 128, 128, 2),
        (2, 272, 480, 256, 256, 3),
    ]:
        x = [
            jnp.asarray(rng.standard_normal((bsz, hh, ww, cin)), jnp.bfloat16)
            for _ in range(3)
        ]
        k = jnp.asarray(rng.standard_normal((kh, kh, cin, cout)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        pad = ((kh // 2, kh - 1 - kh // 2),) * 2

        @jax.jit
        def xla_conv(v, k=k, b=b, pad=pad):
            out = lax.conv_general_dilated(
                v, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return jnp.maximum(out + b.astype(out.dtype), 0)

        fn = functools.partial(conv2d_pallas, kernel=k, bias=b, relu=True)
        got = np.asarray(fn(x[0]), np.float32)
        want = np.asarray(xla_conv(x[0]), np.float32)
        scale = np.abs(want).max()
        print(f"shape {(bsz,hh,ww,cin,cout,kh)}: rel err {np.abs(got-want).max()/scale:.2e}")
        gflop = 2 * bsz * hh * ww * kh * kh * cin * cout / 1e9
        dt1 = measure(f"xla conv {kh}x{kh} {cin}->{cout}", xla_conv, x, batch=bsz)
        dt2 = measure(f"pallas conv {kh}x{kh} {cin}->{cout}", fn, x, batch=bsz)
        print(f"  {gflop:.0f} GFLOP: xla {gflop/dt1/1e3:.1f} TF/s, pallas {gflop/dt2/1e3:.1f} TF/s")


@exp("net")
def run_net():
    from retinex_tpu.models.packed_inference import PackedRetinex
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    batch = 2
    dtype = jnp.bfloat16
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    @jax.jit
    def fwd(x):
        return model.apply(variables, x, train=False)[0]

    packed = PackedRetinex(model, variables)

    @jax.jit
    def fwd_packed(x):
        return packed(x)[0]

    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32), dtype=dtype)
        for _ in range(3)
    ]
    want = np.asarray(fwd(inputs[0]), np.float32)
    got = np.asarray(fwd_packed(inputs[0]), np.float32)
    print(f"packed vs standard: max abs diff {np.abs(want - got).max():.4f} (bf16)")
    measure("net standard 1080p", fwd, inputs, batch=batch)
    measure("net packed 1080p", fwd_packed, inputs, batch=batch)


@exp("netstages")
def run_netstages():
    """Bisect the PACKED model: where does the time go?
    RETINEX_PERF_BATCH overrides the batch (default 2)."""
    from retinex_tpu.models.packed_inference import PackedRetinex
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
    from retinex_tpu.ops.s2d import s2d

    batch = int(os.environ.get("RETINEX_PERF_BATCH", "2"))
    dtype = jnp.bfloat16
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    pk = PackedRetinex(model, variables)

    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32), dtype=dtype)
        for _ in range(3)
    ]
    xps = [s2d(x).astype(dtype) for x in inputs]
    from retinex_tpu.models.packed_inference import _conv_auto

    @jax.jit
    def ie_fullres(xp):
        """input conv + enc1 + dec1 + residual head (packed full-res IE parts),
        with a fake d2 so the middle is excluded."""
        x1p = _conv_auto(xp, pk.k_input, bias=pk.b_input, relu=True)
        x2 = pk._enc1(x1p)
        d1p = pk._dec1(x2 * 0.5) + x1p  # d2 stand-in with the right shape
        r = _conv_auto(d1p, pk.k_rescv, bias=pk.b_rescv, relu=True)
        return _conv_auto(r, pk.k_resout, bias=pk.b_resout)

    @jax.jit
    def ie_middle(xp):
        x1p = _conv_auto(xp, pk.k_input, bias=pk.b_input, relu=True)
        x2 = pk._enc1(x1p)
        return model.apply(variables, x2, False, method=lambda m, a, t: m.ie_net.middle(a, t))

    @jax.jit
    def scale1_conv(xp):
        return _conv_auto(xp, pk.k_s1conv, bias=pk.b_s1conv, relu=True)

    f1s = [scale1_conv(xp) for xp in xps]

    @jax.jit
    def fam_only(f1p):
        return pk._fam_packed(f1p, pk.fam1)

    from retinex_tpu.models.packed_inference import NetCfg

    pk_xla = PackedRetinex(
        model, variables, NetCfg(fam_conv_fused=False, fam_tail_fold=False)
    )

    @jax.jit
    def fam_xla_tail(f1p):
        return pk_xla._fam_packed(f1p, pk_xla.fam1)

    from retinex_tpu.ops.fused_blocks import fam_tail_apply, fam_tail_stats

    @jax.jit
    def tail_kernels_only(f1p):
        ca_vec = jnp.ones((f1p.shape[0], 128), jnp.float32) * 0.5
        sa_in = fam_tail_stats(f1p, ca_vec)
        sa = jax.nn.sigmoid(sa_in[..., :4])
        return fam_tail_apply(f1p, ca_vec, sa)

    @jax.jit
    def scale2_packed_only(x):
        from retinex_tpu.ops.s2d import s2d as _s2d
        x2s = resize_scale_local(x, 0.5)
        x2p = _s2d(x2s.astype(pk.model.dtype))
        pooled = x2p.reshape(*x2p.shape[:3], 4, 3).max(axis=3)
        from retinex_tpu.models.packed_inference import _conv_auto as _ca
        f2p = _ca(_s2d(pooled), pk.k_s2conv, bias=pk.b_s2conv, relu=True)
        return pk._fam_packed(f2p, pk.fam2)

    @jax.jit
    def scale2_flax_only(x):
        x2s = resize_scale_local(x, 0.5)
        return model.apply(variables, x2s, method=lambda m, a: m.scale2(a))

    @jax.jit
    def scale23(x):
        h, w = x.shape[1], x.shape[2]
        x2s = resize_scale_local(x, 0.5)
        x3s = resize_scale_local(x, 0.25)
        f2 = model.apply(variables, x2s, method=lambda m, a: m.scale2(a))
        f3 = model.apply(variables, x3s, method=lambda m, a: m.scale3(a))
        from retinex_tpu.ops.resize import resize_bilinear

        return s2d(resize_bilinear(f2, h, w)), s2d(resize_bilinear(f3, h, w))

    from retinex_tpu.ops.resize import resize_scale as resize_scale_local

    @jax.jit
    def full(x):
        return pk(x)[0]

    measure("packed full model", full, inputs, batch=batch)
    measure("ie full-res stages", ie_fullres, xps, batch=batch)
    measure("ie enc1+middle", ie_middle, xps, batch=batch)
    measure("scale1 conv", scale1_conv, xps, batch=batch)
    measure("scale1 FAM (fused tail)", fam_only, f1s, batch=batch)
    measure("scale1 FAM (xla tail)", fam_xla_tail, f1s, batch=batch)
    measure("tail kernels only", tail_kernels_only, f1s, batch=batch)
    measure("scale2 packed", scale2_packed_only, inputs, batch=batch)
    measure("scale2 flax", scale2_flax_only, inputs, batch=batch)
    measure("scale2/3 towers+resizes", scale23, inputs, batch=batch)


@exp("inner")
def run_inner():
    """Bisect the /4-and-below IENet body (enc3 + bottleneck + ASPP + dec3):
    where do the ~20 ms/batch(2) of 'middle' go, and do the dilated ASPP
    branches (d=6/12/18 at /8) leave MXU throughput on the table vs a
    shifted-matmul decomposition?"""
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    batch = 2
    dtype = jnp.bfloat16
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.default_rng(0)
    # /4 feature map at 1080p: [b, 272, 480, 128]
    x3s = [
        jnp.asarray(rng.standard_normal((batch, 272, 480, 128)) * 0.3, dtype)
        for _ in range(3)
    ]

    def stage(name, method):
        return jax.jit(
            lambda v: model.apply(variables, v, False, method=method)
        )

    inner = stage("inner", lambda m, a, t: m.ie_net.inner(a, t))
    enc3 = stage("enc3", lambda m, a, t: m.ie_net.enc3(a, t))
    x4s = [enc3(v) for v in x3s]  # [b, 136, 240, 256]
    bott = stage("bott", lambda m, a, t: m.ie_net.bottleneck1(a, t))
    aspp = stage("aspp", lambda m, a, t: m.ie_net.aspp(a, t))
    dec3 = stage("dec3", lambda m, a, t: m.ie_net.dec3(a, t))

    measure("inner total", inner, x3s, batch=batch)
    measure("enc3", enc3, x3s, batch=batch)
    measure("bottleneck1 (res block)", bott, x4s, batch=batch)
    measure("aspp", aspp, x4s, batch=batch)
    measure("dec3 (UpBlock)", dec3, x4s, batch=batch)

    # One dilated conv (d=18, 256->256) alone, XLA conv emitter vs the
    # shifted-matmul decomposition (9 shifted [H*W,256] @ [256,256] dots).
    p = variables["params"]["ie_net"]["aspp"]["aspp_branch2"]
    k = jnp.asarray(p["Conv_0"]["kernel"], dtype)  # [3,3,256,256]

    from jax import lax

    def d18_conv(x):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((18, 18), (18, 18)), rhs_dilation=(18, 18),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def d18_shift(x):
        d = 18
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        h, w = x.shape[1], x.shape[2]
        acc = None
        for u in range(3):
            for v in range(3):
                sl = xp[:, u * d : u * d + h, v * d : v * d + w, :]
                t = jnp.einsum(
                    "bhwi,io->bhwo", sl, k[u, v],
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        return acc.astype(x.dtype)

    measure("aspp d18 conv (XLA)", jax.jit(d18_conv), x4s, batch=batch)
    measure("aspp d18 as 9 shifted dots", jax.jit(d18_shift), x4s, batch=batch)

    # All three dilated branches batched into ONE 9-shift pass (shared slices
    # impossible — different d — but a single fused jit):
    ks = {
        6: jnp.asarray(variables["params"]["ie_net"]["aspp"]["aspp_branch0"]["Conv_0"]["kernel"], dtype),
        12: jnp.asarray(variables["params"]["ie_net"]["aspp"]["aspp_branch1"]["Conv_0"]["kernel"], dtype),
        18: k,
    }

    def branches_shift(x):
        h, w = x.shape[1], x.shape[2]
        outs = []
        for d, kk in ks.items():
            xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
            acc = None
            for u in range(3):
                for v in range(3):
                    sl = xp[:, u * d : u * d + h, v * d : v * d + w, :]
                    t = jnp.einsum(
                        "bhwi,io->bhwo", sl, kk[u, v],
                        preferred_element_type=jnp.float32,
                    )
                    acc = t if acc is None else acc + t
            outs.append(acc.astype(x.dtype))
        return outs

    def branches_conv(x):
        return [
            lax.conv_general_dilated(
                x, kk, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            for d, kk in ks.items()
        ]

    measure("aspp 3 dilated convs (XLA)", jax.jit(branches_conv), x4s, batch=batch)
    measure("aspp 3 dilated as shifted dots", jax.jit(branches_shift), x4s, batch=batch)


@exp("netcfg")
def run_netcfg():
    """Full packed model under each NetCfg kernel-choice combo.
    RETINEX_PERF_BATCH overrides the batch (default 2)."""
    from retinex_tpu.models.packed_inference import NetCfg, PackedRetinex
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    batch = int(os.environ.get("RETINEX_PERF_BATCH", "2"))
    dtype = jnp.bfloat16
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32), dtype=dtype)
        for _ in range(3)
    ]

    def run_with(name, **kw):
        pk = PackedRetinex(model, variables, NetCfg(**kw))

        @jax.jit
        def f(x):
            return pk(x)[0]

        measure(f"full {name}", f, inputs, batch=batch)

    run_with("default")                                 # famconv + folded tail
    run_with("planar-sa-off", planar_sa=False)
    run_with("ups-mode1", ups_mode=1)
    run_with("ups-mode2", ups_mode=2)
    run_with("fam-xla-folded", fam_xla_folded=True, fam_conv_fused=False,
             fam_tail_fold=False)
    run_with("aspp-dots", aspp_dots=True)
    run_with("xla-tail", fam_tail_fold=False)           # famconv, XLA tail
    run_with("no-fused", fam_conv_fused=False, fam_tail_fold=False)
    run_with("dec1-chain", dec1_chain=True)
    run_with("unpacked-s2", packed_scale2=False)

    inputs4 = [
        jnp.asarray(rng.random((4, H, W, 3), dtype=np.float32), dtype=dtype)
        for _ in range(3)
    ]
    pk = PackedRetinex(model, variables)

    @jax.jit
    def f4(x):
        return pk(x)[0]

    measure("full default batch=4", f4, inputs4, batch=4)


@exp("narrowconv")
def run_narrowconv():
    """12->128 packed input convs: XLA conv emitter vs im2col GEMM."""
    from retinex_tpu.ops.s2d import conv_im2col, conv_s2d

    rng = np.random.default_rng(0)
    x = [
        jnp.asarray(rng.standard_normal((2, 544, 960, 12)), jnp.bfloat16)
        for _ in range(3)
    ]
    k = jnp.asarray(rng.standard_normal((3, 3, 12, 128)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)

    f_xla = jax.jit(lambda v: jax.nn.relu(conv_s2d(v, k, bias=b, quadrant_bias=False)))
    f_i2c = jax.jit(lambda v: conv_im2col(v, k, bias=b, relu=True))
    want = np.asarray(f_xla(x[0]), np.float32)
    got = np.asarray(f_i2c(x[0]), np.float32)
    print(f"im2col vs conv: max abs diff {np.abs(want - got).max():.4f} (bf16 scale {np.abs(want).max():.1f})")
    measure("conv12->128 XLA", f_xla, x, batch=2)
    measure("conv12->128 im2col", f_i2c, x, batch=2)


@exp("narrowpallas")
def run_narrowpallas():
    """conv2d_narrow (in-VMEM im2col) vs XLA unpacked vs packed conv."""
    from retinex_tpu.ops.conv_pallas import conv2d_narrow
    from retinex_tpu.ops.s2d import conv_s2d, pack_kernel_s1, s2d

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    xs = [jnp.asarray(rng.standard_normal((2, H, W, 32)) * 0.3, dtype) for _ in range(3)]
    xps = [s2d(x) for x in xs]
    k = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.05, jnp.float32)
    k64 = jnp.asarray(rng.standard_normal((3, 3, 32, 64)) * 0.05, jnp.float32)
    kp = pack_kernel_s1(k)
    bias = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    b64 = jnp.asarray(rng.standard_normal((64,)), jnp.float32)

    @jax.jit
    def xla_unpacked(x):
        from jax import lax
        return lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def xla_packed(xp):
        return conv_s2d(xp, kp, bias=bias)

    @jax.jit
    def pallas_narrow(x):
        return conv2d_narrow(x, k, bias, relu=True)

    @jax.jit
    def pallas_narrow64(x):
        return conv2d_narrow(x, k64, b64, relu=True)

    @jax.jit
    def pallas_narrow_dil(x):
        return conv2d_narrow(x, k, bias, dilation=2)

    from retinex_tpu.ops.conv_pallas import conv2d_pallas, conv2d_pallas_im2col

    @jax.jit
    def pallas_packed_tap(xp):
        return conv2d_pallas(xp, kp, jnp.tile(bias, 4))

    @jax.jit
    def pallas_packed_im2col(xp):
        return conv2d_pallas_im2col(xp, kp, jnp.tile(bias, 4))

    want = np.asarray(xla_packed(xps[0]), np.float32)
    got = np.asarray(pallas_packed_im2col(xps[0]), np.float32)
    print(f"packed im2col vs conv_s2d: max abs diff {np.abs(want - got).max():.5f}")

    gflop = 2 * 2 * H * W * 9 * 32 * 32 / 1e9
    dt = measure("xla unpacked 3x3 32->32", xla_unpacked, xs)
    print(f"   = {gflop / dt / 1e3:.1f} TF/s logical")
    dt = measure("xla packed   3x3 32->32", xla_packed, xps)
    print(f"   = {gflop / dt / 1e3:.1f} TF/s logical")
    dt = measure("pallas packed per-tap", pallas_packed_tap, xps)
    print(f"   = {gflop / dt / 1e3:.1f} TF/s logical")
    dt = measure("pallas packed im2col", pallas_packed_im2col, xps)
    print(f"   = {gflop / dt / 1e3:.1f} TF/s logical")


@exp("scale23")
def run_scale23():
    """Break down the 17.6 ms scale2/3 block: towers vs resizes vs s2d."""
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
    from retinex_tpu.ops.resize import resize_bilinear, resize_scale
    from retinex_tpu.ops.s2d import s2d

    batch = 2
    dtype = jnp.bfloat16
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32), dtype=dtype)
        for _ in range(3)
    ]

    @jax.jit
    def downsizes(x):
        return resize_scale(x, 0.5), resize_scale(x, 0.25)

    downs = [downsizes(x) for x in inputs]

    @jax.jit
    def towers(args):
        x2s, x3s = args
        f2 = model.apply(variables, x2s, method=lambda m, a: m.scale2(a))
        f3 = model.apply(variables, x3s, method=lambda m, a: m.scale3(a))
        return f2, f3

    fs = [towers(d) for d in downs]

    @jax.jit
    def upsizes(args):
        f2, f3 = args
        return (
            s2d(resize_bilinear(f2, H, W)),
            s2d(resize_bilinear(f3, H, W)),
        )

    measure("downsizes (1/2, 1/4)", downsizes, inputs, batch=batch)
    measure("towers only", towers, downs, batch=batch)
    measure("upsizes+s2d", upsizes, fs, batch=batch)


@exp("sol")
def run_sol():
    """Speed-of-light decomposition for the v3 gather CLAHE pipeline.

    Measures (a) each stage of the production u8 planar pipeline in its own
    jit, (b) VPU fma / gather / fast-cbrt element throughput with chained
    Pallas microkernels at the pipeline's own block shapes, (c) HBM stream
    bandwidth for u8 and f32 — the numbers BENCH_NOTES' speed-of-light
    analysis derives from.
    """
    import functools as ft

    import retinex_tpu.ops.clahe_gather as cg
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(10)
    ]
    hh, hw = H // NCY, W // NCX

    @jax.jit
    def full(xp):
        return cg.clahe_rgb_u8_planar_gather(xp)

    @jax.jit
    def fwd_only(xp):
        rgb6 = xp.reshape(B, 3, NCY, hh, NCX, hw)
        return cg._fwd_stage(rgb6)

    labs = [fwd_only(x) for x in xs]
    area = (2 * hh) * (2 * hw)

    @jax.jit
    def tables_only(lab6):
        return cg._tables_stage(lab6[0], 2.0, TILES, TILES, area)

    luts = [tables_only(l) for l in labs]

    @jax.jit
    def apply_only(args):
        lab6, lane_luts = args
        return cg._apply_stage(lab6, lane_luts)

    measure("full u8 planar", full, xs)
    measure("fwd stage only", fwd_only, xs)
    measure("tables stage only", tables_only, labs, batch=B)
    measure("apply stage only", apply_only, list(zip(labs, luts)), batch=B)

    # --- microbenches at pipeline-like shapes ---------------------------
    rows = hh * NCX            # 1088 rows per band-of-4? use a flat big block
    NROW, LANES = 512, 128     # per-program block: 512x128 f32 = 256 KB
    GRID = 34 * B              # ~17.8M elements ~= one 8-batch of pixels
    total_elems = NROW * LANES * GRID

    def fma_kernel(k, x_ref, o_ref):
        # logistic map: serial, NOT constant-foldable (x*a+b chains compose
        # into one affine and measured a negative slope — round-3 lesson).
        x = x_ref[...]
        for _ in range(k):
            x = x * (1.0 - x)
        o_ref[...] = x

    def run_chain(kernel, k, arr):
        return pl.pallas_call(
            ft.partial(kernel, k),
            grid=(GRID,),
            in_specs=[pl.BlockSpec((NROW, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NROW, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NROW * GRID, LANES), arr.dtype),
        )(arr)

    fbuf = [jnp.asarray(rng.random((NROW * GRID, LANES), dtype=np.float32)) for _ in range(2)]

    for k in (8, 64):
        f = jax.jit(ft.partial(run_chain, fma_kernel, k))
        dt = measure(f"fma chain k={k}", f, fbuf, batch=B)
    # ps/op = (dt64 - dt8) / 56 / total_elems -- printed by the caller script

    def cbrt_kernel(k, x_ref, o_ref):
        x = x_ref[...]
        for _ in range(k):
            x = cg._fast_cbrt(x + 1.0)
        o_ref[...] = x

    for k in (2, 8):
        f = jax.jit(ft.partial(run_chain, cbrt_kernel, k))
        measure(f"fast_cbrt chain k={k}", f, fbuf, batch=B)

    def gather_kernel(k, x_ref, o_ref):
        idx = x_ref[...]
        table = jax.lax.broadcasted_iota(jnp.int32, (NROW, LANES), 1)
        table = (table * 7 + 3) % 128
        for _ in range(k):
            idx = jnp.take_along_axis(table, idx, axis=1)
        o_ref[...] = idx

    ibuf = [
        jnp.asarray(rng.integers(0, 128, (NROW * GRID, LANES), dtype=np.int32))
        for _ in range(2)
    ]
    for k in (2, 8):
        f = jax.jit(ft.partial(run_chain, gather_kernel, k))
        measure(f"gather chain k={k}", f, ibuf, batch=B)

    # --- HBM stream: out-of-place add on u8 / f32 -----------------------
    ubuf = [
        jnp.asarray(rng.integers(0, 255, (B, 3, H, W), dtype=np.uint8))
        for _ in range(2)
    ]

    @jax.jit
    def copy_u8(x):
        return x + jnp.uint8(1)

    measure("hbm u8 in+out 2x50MB", copy_u8, ubuf)

    f32buf = [jnp.asarray(rng.random((B, 3, H, W), dtype=np.float32)) for _ in range(2)]

    @jax.jit
    def copy_f32(x):
        return x + 1.0

    measure("hbm f32 in+out 2x200MB", copy_f32, f32buf)

    # u8 <-> f32 quantize round trip (the f32 API wrapper cost)
    @jax.jit
    def quant_roundtrip(x):
        q = jnp.clip(jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)
        return q.astype(jnp.float32) / 255.0

    measure("f32->u8->f32 quantize", quant_roundtrip, f32buf)

    # --- apply-kernel bisection: lookup+blend only vs inverse-colorspace only
    ncy, ncx_ = NCY, NCX
    nb = 4

    def lut_only_kernel(lab_ref, luts_ref, xa_ref, ya_ref, out_ref):
        # the LUT lookup + bilinear blend WITHOUT the inverse colorspace
        rows = hh * ncx_
        shape = (rows, hw)
        shape128 = (rows, 128)
        xa = jnp.broadcast_to(xa_ref[None], (hh, ncx_, hw)).reshape(shape)
        for r in range(nb):
            v = lab_ref[0, r].astype(jnp.int32).reshape(rows, hw)
            ya2 = ya_ref[:, (r % 2) : (r % 2) + 1]
            ya = jnp.broadcast_to(ya2[:, :, None], (hh, ncx_, hw)).reshape(shape)
            v128 = jnp.pad(v, ((0, 0), (0, 128 - hw))) if hw < 128 else v
            hi_side = v128 >= 128
            idx128 = jnp.where(hi_side, v128 - 128, v128)
            lo_t = jnp.broadcast_to(luts_ref[r, :, 0][None], (hh, ncx_, 128)).reshape(shape128)
            hi_t = jnp.broadcast_to(luts_ref[r, :, 1][None], (hh, ncx_, 128)).reshape(shape128)
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
            out_ref[0, r] = L2.astype(jnp.int32).astype(jnp.uint8).reshape(hh, ncx_, hw)
            out_ref[1, r] = lab_ref[1, r]
            out_ref[2, r] = lab_ref[2, r]

    def inverse_only_kernel(lab_ref, out_ref):
        # inverse Lab->RGB colorspace only (L passes through as L2)
        rows = hh * ncx_
        shape = (rows, hw)
        for r in range(nb):
            L2 = lab_ref[0, r].astype(jnp.int32).astype(jnp.float32).reshape(shape)
            a8 = lab_ref[1, r].astype(jnp.int32).astype(jnp.float32).reshape(shape)
            b8 = lab_ref[2, r].astype(jnp.int32).astype(jnp.float32).reshape(shape)
            fy = (L2 * (100.0 / 255.0) + 16.0) / 116.0
            fx = fy + (a8 - 128.0) / 500.0
            fz = fy - (b8 - 128.0) / 200.0
            Y = cg._lab_f_inv(fy)
            X = cg._lab_f_inv(fx) * cg._XN
            Z = cg._lab_f_inv(fz) * cg._ZN
            m = cg._XYZ2RGB
            for c in range(3):
                ch = cg._linear_to_srgb(m[c][0] * X + m[c][1] * Y + m[c][2] * Z, True)
                ch = jnp.round(jnp.clip(ch, 0.0, 1.0) * 255.0).astype(jnp.int32)
                out_ref[c, r] = ch.astype(jnp.uint8).reshape(hh, ncx_, hw)

    lab_specs = pl.BlockSpec(
        (3, None, nb, hh, ncx_, hw), lambda i, j: (0, i, j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs6 = pl.BlockSpec(
        (3, None, nb, hh, ncx_, hw), lambda i, j: (0, i, j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    labs6 = [l.reshape(3, B, ncy, hh, ncx_, hw) for l in labs]
    luts_in = luts

    @jax.jit
    def lut_only(args):
        lab6, lane_luts = args
        wx = cg._blend_weights(hw)
        wy = cg._blend_weights(hh)
        xa_tab = jnp.asarray(wx[np.arange(ncx_) % 2])
        ya_tab = jnp.asarray(np.ascontiguousarray(wy.T))
        return pl.pallas_call(
            lut_only_kernel,
            grid=(B, ncy // nb),
            in_specs=[
                lab_specs,
                pl.BlockSpec((None, nb, ncx_, 2, 128), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ncx_, hw), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((hh, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs6,
            out_shape=jax.ShapeDtypeStruct((3, B, ncy, hh, ncx_, hw), jnp.uint8),
        )(lab6, lane_luts, xa_tab, ya_tab)

    @jax.jit
    def inverse_only(lab6):
        return pl.pallas_call(
            inverse_only_kernel,
            grid=(B, ncy // nb),
            in_specs=[lab_specs],
            out_specs=out_specs6,
            out_shape=jax.ShapeDtypeStruct((3, B, ncy, hh, ncx_, hw), jnp.uint8),
        )(lab6)

    from retinex_tpu.ops.clahe_fast import _blend_weights as _bw  # noqa: F401

    measure("apply: lut+blend only", lut_only, list(zip(labs6, luts_in)), batch=B)
    measure("apply: inverse colorspace only", inverse_only, labs6, batch=B)


@exp("polyab")
def run_polyab():
    """Clean A/B: fwd stage with poly vs gather de-gamma, plus the full u8
    pipeline, in one process (cross-run slope comparisons on axon are noise
    — the round-3 sol reruns swung 27% with host load)."""
    import retinex_tpu.ops.clahe_gather as cg

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(10)
    ]
    hh, hw = H // NCY, W // NCX

    @jax.jit
    def full(xp):
        return cg.clahe_rgb_u8_planar_gather(xp)

    @jax.jit
    def fwd_poly(xp):
        return cg._fwd_stage(xp.reshape(B, 3, NCY, hh, NCX, hw), poly=True)

    @jax.jit
    def fwd_gather(xp):
        return cg._fwd_stage(xp.reshape(B, 3, NCY, hh, NCX, hw), poly=False)

    labs = [fwd_poly(x) for x in xs]
    area = (2 * hh) * (2 * hw)

    @jax.jit
    def tables_only(lab6):
        return cg._tables_stage(lab6[0], 2.0, TILES, TILES, area)

    luts = [tables_only(l) for l in labs]

    @jax.jit
    def apply_only(args):
        lab6, lane_luts = args
        return cg._apply_stage(lab6, lane_luts)

    # interleave the two fwd variants so environment drift hits both equally
    for rep in range(2):
        measure(f"fwd poly   (rep {rep})", fwd_poly, xs)
        measure(f"fwd gather (rep {rep})", fwd_gather, xs)
    measure("tables", tables_only, labs, batch=B)
    measure("apply (folded-gamma)", apply_only, list(zip(labs, luts)), batch=B)
    measure("full u8 planar", full, xs)


@exp("bigbatch")
def run_bigbatch():
    """Packed-model batch scaling after the MXU-matmul fusion upsamples:
    does b16 fit now (round 2: 32-lane-minor interleaves padded 4-10x and
    OOM'd), and where does fps/chip saturate?"""
    from retinex_tpu.models.packed_inference import NetCfg, PackedRetinex
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    dtype = jnp.bfloat16
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    kw = {}
    if os.environ.get("RETINEX_PERF_NO_PLANAR_SA"):
        kw["planar_sa"] = False
    if "RETINEX_PERF_UPS_MODE" in os.environ:
        kw["ups_mode"] = int(os.environ["RETINEX_PERF_UPS_MODE"])
    cfg = NetCfg(**kw)
    pk = PackedRetinex(model, variables, cfg)

    @jax.jit
    def f(x):
        return pk(x)[0]

    rng = np.random.default_rng(0)
    for b in tuple(int(v) for v in os.environ.get("RETINEX_PERF_BATCHES", "8,12,16").split(",")):
        try:
            inputs = [
                jnp.asarray(rng.random((b, H, W, 3), dtype=np.float32), dtype=dtype)
                for _ in range(3)
            ]
            measure(f"packed full b{b}", f, inputs, batch=b)
        except Exception as e:
            print(f"packed full b{b}: FAILED {type(e).__name__}: {e}", flush=True)


@exp("mathops")
def run_mathops():
    """Per-op VPU cost via interleaved chained kernels: which ops are
    multi-pass on Mosaic (sqrt? select? casts? round?). Chains use serial
    dependencies; cost = slope between k=2 and k=10 per element."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NROW, LANES, GRID = 512, 128, 136
    total = NROW * LANES * GRID

    def run_chain(body, k, arr):
        def kern(x_ref, o_ref):
            x = x_ref[...]
            for _ in range(k):
                x = body(x)
            o_ref[...] = x

        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((NROW, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NROW, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NROW * GRID, LANES), arr.dtype),
        )(arr)

    rng = np.random.default_rng(0)
    fbuf = [
        jnp.asarray(rng.random((NROW * GRID, LANES), dtype=np.float32) + 0.5)
        for _ in range(4)
    ]

    bodies = {
        "mul-add (logistic)": lambda x: x * (1.0 - x),
        "sqrt": lambda x: jnp.sqrt(x + 1.0),
        "rsqrt": lambda x: jax.lax.rsqrt(x + 1.0),
        "where-select": lambda x: jnp.where(x > 0.5, x * 0.5, x + 0.25),
        "round": lambda x: jnp.round(x) * 0.3 + x * 0.1,
        "f32<->i32 cast pair": lambda x: (x.astype(jnp.int32).astype(jnp.float32) + x) * 0.5,
        "exp": lambda x: jnp.exp(-x),
        "reciprocal": lambda x: 1.0 / (x + 1.0),
    }

    results = {}
    for name, body in bodies.items():
        ts = {}
        for k in (2, 10):
            f = jax.jit(ft.partial(run_chain, body, k))
            ts[k] = measure(f"{name} k={k}", f, fbuf, batch=8)
        ps = (ts[10] - ts[2]) / 8 / total * 1e12
        results[name] = ps
    print("--- ps/elem per op application ---", flush=True)
    for name, ps in results.items():
        print(f"{name:24s} {ps:7.2f} ps/elem", flush=True)


@exp("gammaab")
def run_gammaab():
    """Interleaved A/B: apply stage with Newton 12th-root gamma (sqrt-free)
    vs the 2-sqrt poly form, plus the full pipeline with the winner."""
    import retinex_tpu.ops.clahe_gather as cg

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(10)
    ]
    hh, hw = H // NCY, W // NCX

    @jax.jit
    def fwd(xp):
        return cg._fwd_stage(xp.reshape(B, 3, NCY, hh, NCX, hw))

    labs = [fwd(x) for x in xs]
    area = (2 * hh) * (2 * hw)

    @jax.jit
    def tables_only(lab6):
        return cg._tables_stage(lab6[0], 2.0, TILES, TILES, area)

    luts = [tables_only(l) for l in labs]
    pairs = list(zip(labs, luts))

    @jax.jit
    def apply_newton(args):
        lab6, lane_luts = args
        return cg._apply_stage(lab6, lane_luts, newton=True)

    @jax.jit
    def apply_sqrt(args):
        lab6, lane_luts = args
        return cg._apply_stage(lab6, lane_luts, newton=False)

    for rep in range(2):
        measure(f"apply newton (rep {rep})", apply_newton, pairs, batch=B)
        measure(f"apply 2-sqrt (rep {rep})", apply_sqrt, pairs, batch=B)

    @jax.jit
    def full(xp):
        return cg.clahe_rgb_u8_planar_gather(xp)

    measure("full u8 planar (newton)", full, xs)

    xs_f32 = [
        jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32) * 0.6)
        for _ in range(6)
    ]

    @jax.jit
    def full_f32(x):
        return cg.clahe_lab_rgb_gather(x)

    measure("full f32 (newton)", full_f32, xs_f32)


@exp("pallas_old")
def run_pallas_old():
    from retinex_tpu.ops.clahe_pallas import clahe_lab_rgb_pallas

    inputs = make_inputs()
    measure("pipeline_pallas_r1", clahe_lab_rgb_pallas, inputs)


@exp("layout5")
def run_layout5():
    """6D cell-blocked vs 5D row-merged kernel layouts: the 6D blocks' minor
    dims (ncx=16, hw=120) pad 2.13x under the u8 (32,128) tiling and every
    in-kernel [hh,ncx,hw]->[rows,hw] merge is a padded-sublane relayout; the
    5D blocks avoid both."""
    import retinex_tpu.ops.clahe_gather as cg

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    measure("u8 planar 6D (current)", jax.jit(cg.clahe_rgb_u8_planar_gather6), xs)
    measure("u8 planar 5D", jax.jit(cg.clahe_rgb_u8_planar_gather5), xs)

    hh, hw = H // NCY, W // NCX
    rows = hh * NCX

    # stage-level: fwd alone, both layouts
    @jax.jit
    def fwd6(xp):
        return cg._fwd_stage(xp.reshape(B, 3, NCY, hh, NCX, hw))

    @jax.jit
    def fwd5(xp):
        return cg._fwd_stage5(xp.reshape(B, 3, NCY, rows, hw))

    measure("fwd 6D only", fwd6, xs)
    measure("fwd 5D only", fwd5, xs)

    labs5 = [fwd5(x) for x in xs]
    area = (2 * hh) * (2 * hw)

    @jax.jit
    def tables_only(lab5):
        return cg._tables_stage(
            lab5[0].reshape(B, NCY, hh, NCX, hw), 2.0, TILES, TILES, area
        )

    luts = [tables_only(l) for l in labs5]

    @jax.jit
    def apply5(args):
        lab5, lane_luts = args
        return cg._apply_stage5(lab5, lane_luts, NCX)

    measure("apply 5D only", apply5, list(zip(labs5, luts)), batch=B)


@exp("layout5b")
def run_layout5b():
    """Round-3 second pass: 5D core with the L-plane-only tables feed (the
    first pass reshaped the full 150 MB Lab tensor to 6D: ~1 ms of copy),
    vs the 6D core; plus the production f32 wrapper (in1+out1 glue) over
    each core."""
    import retinex_tpu.ops.clahe_gather as cg

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    measure("u8 planar 6D", jax.jit(cg.clahe_rgb_u8_planar_gather6), xs)
    measure("u8 planar 5D (L-feed)", jax.jit(cg.clahe_rgb_u8_planar_gather5), xs)

    xf = make_inputs(batch=B, n=6)
    measure("f32 wrapper (6D core)", jax.jit(cg.clahe_lab_rgb_gather), xf)

    hh, hw = H // NCY, W // NCX

    @jax.jit
    def f32_5d(x):
        xp = x.transpose(0, 3, 1, 2)
        xq = jnp.clip(jnp.round(jnp.clip(xp, 0.0, 1.0) * 255.0), 0, 255).astype(
            jnp.uint8
        )
        outp = cg.clahe_rgb_u8_planar_gather5(xq)
        return (outp.astype(jnp.float32) / 255.0).transpose(0, 2, 3, 1)

    measure("f32 wrapper (5D core)", f32_5d, xf)

    # u8 NHWC ingest (the batched-enhance non-planar path) over each core
    xs_nhwc = [x.transpose(0, 2, 3, 1) for x in xs]
    measure("u8 NHWC (6D core)", jax.jit(cg.clahe_rgb_u8_gather), xs_nhwc)

    @jax.jit
    def u8_nhwc_5d(x):
        return cg.clahe_rgb_u8_planar_gather5(x.transpose(0, 3, 1, 2)).transpose(
            0, 2, 3, 1
        )

    measure("u8 NHWC (5D core)", u8_nhwc_5d, xs_nhwc)


@exp("f32wrap")
def run_f32wrap():
    """f32 API wrapper cost: the sol run measured f32 io floor 0.72 ms but the
    quantize+transpose glue around the u8 planar core adds ~0.9-1.0 ms. A/B
    formulations of the in-glue (f32 NHWC -> u8 planar-6d) and out-glue
    (u8 planar-6d -> f32 NHWC) to find which order XLA fuses into single
    transpose+convert passes (u8 NHWC intermediates may carry padded tilings:
    minor dim 3)."""
    import retinex_tpu.ops.clahe_gather as cg

    B = 8
    xs = make_inputs(batch=B, n=6)
    hh, hw = H // NCY, W // NCX

    def core(xq6):
        lab6 = cg._fwd_stage(xq6, False)
        lab6 = jax.lax.optimization_barrier(lab6)
        lane_luts = cg._tables_stage(lab6[0], 2.0, TILES, TILES, (2 * hh) * (2 * hw))
        return cg._apply_stage(lab6, lane_luts, False)  # [b,3,ncy,hh,ncx,hw] u8

    def in_v0(x):  # current: quantize NHWC u8 -> transpose -> reshape 6d
        xq = jnp.clip(jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)
        return xq.transpose(0, 3, 1, 2).reshape(B, 3, NCY, hh, NCX, hw)

    def in_v1(x):  # transpose f32 first, quantize planar (no u8 NHWC tensor)
        xp = x.transpose(0, 3, 1, 2)
        xq = jnp.clip(jnp.round(jnp.clip(xp, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)
        return xq.reshape(B, 3, NCY, hh, NCX, hw)

    def in_v2(x):  # 6d-reshape f32 then one 6d transpose with convert after
        x6 = x.reshape(B, NCY, hh, NCX, hw, 3).transpose(0, 5, 1, 2, 3, 4)
        return jnp.clip(jnp.round(jnp.clip(x6, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)

    def out_w0(rgbp):  # current: u8 planar -> u8 NHWC -> f32
        out = rgbp.reshape(B, 3, H, W).transpose(0, 2, 3, 1)
        return out.astype(jnp.float32) / 255.0

    def out_w1(rgbp):  # cast f32 fused into the transpose source
        out = (rgbp.reshape(B, 3, H, W).astype(jnp.float32) / 255.0).transpose(0, 2, 3, 1)
        return out

    for iname, fin in (("in0", in_v0), ("in1", in_v1), ("in2", in_v2)):
        for oname, fout in (("out0", out_w0), ("out1", out_w1)):
            f = jax.jit(lambda x, fin=fin, fout=fout: fout(core(fin(x))))
            measure(f"f32 {iname}+{oname}", f, xs)
    # glue-only floors (no kernels): quantize+relayout in, cast+relayout out
    for iname, fin in (("in0", in_v0), ("in1", in_v1), ("in2", in_v2)):
        f = jax.jit(lambda x, fin=fin: fin(x))
        measure(f"glue {iname} only", f, xs)
    xq6s = [jax.jit(in_v1)(x) for x in xs]
    for oname, fout in (("out0", out_w0), ("out1", out_w1)):
        f = jax.jit(fout)
        measure(f"glue {oname} only", f, xq6s)


@exp("stages5")
def run_stages5():
    """In-graph stage attribution for the production 5D planar pipeline via
    cumulative prefixes (one process, interleaved — the only trustworthy
    axon method): glue floor -> +fwd -> +tables -> full, plus a no-barrier
    variant (is the fwd->tables optimization_barrier still needed/harmful
    now that every stage is its own pallas_call?)."""
    import retinex_tpu.ops.clahe_gather as cg

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    hh, hw = H // NCY, W // NCX
    rows = hh * NCX
    area = (2 * hh) * (2 * hw)

    measure("full (baseline)", jax.jit(cg.clahe_rgb_u8_planar_gather5), xs)

    @jax.jit
    def fwd_only(xp):
        rgb5 = xp.reshape(B, 3, NCY, rows, hw)
        lab5 = cg._fwd_stage5(rgb5, False)
        return lab5.reshape(3, B, H, W)

    measure("prefix: fwd only", fwd_only, xs)

    @jax.jit
    def fwd_tables(xp):
        rgb5 = xp.reshape(B, 3, NCY, rows, hw)
        lab5 = cg._fwd_stage5(rgb5, False)
        lab5 = jax.lax.optimization_barrier(lab5)
        l_cells = lab5[0].reshape(B, NCY, hh, NCX, hw)
        lane_luts = cg._tables_stage(l_cells, 2.0, TILES, TILES, area)
        return lab5.reshape(3, B, H, W), lane_luts

    measure("prefix: fwd+tables", fwd_tables, xs)

    @jax.jit
    def full_nobarrier(xp):
        rgb5 = xp.reshape(B, 3, NCY, rows, hw)
        lab5 = cg._fwd_stage5(rgb5, False)
        l_cells = lab5[0].reshape(B, NCY, hh, NCX, hw)
        lane_luts = cg._tables_stage(l_cells, 2.0, TILES, TILES, area)
        rgbp = cg._apply_stage5(lab5, lane_luts, NCX, False)
        return rgbp.reshape(B, 3, H, W)

    measure("full, no barrier", full_nobarrier, xs)

    # u8 output copy floor: ingest + one cheap elementwise pass + output
    @jax.jit
    def copy_floor(xp):
        return xp + jnp.uint8(1)

    measure("glue floor (copy)", copy_floor, xs)


@exp("lumafast")
def run_lumafast():
    """Fast luma-gain CLAHE (ops/clahe_luma.py) vs the exact Lab pipeline,
    interleaved (same process, same inputs): planar u8, NHWC u8, f32 wrapper.
    The SOL analysis predicts ~45 op-slots/px for luma-gain vs ~230 for Lab."""
    import retinex_tpu.ops.clahe_gather as cg
    import retinex_tpu.ops.clahe_luma as cl

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]

    # On-chip kernel-vs-XLA-oracle parity first (the CPU tests only cover
    # interpret mode; this is the real Mosaic lowering).
    want = np.asarray(
        cl.clahe_luma_rgb_u8_xla(xs[0].transpose(0, 2, 3, 1))
    ).astype(np.int32)
    got = (
        np.asarray(cl.clahe_luma_rgb_u8_planar(xs[0]))
        .transpose(0, 2, 3, 1)
        .astype(np.int32)
    )
    d = np.abs(want - got)
    print(
        f"on-chip parity vs XLA oracle: maxd {d.max()} frac>0 {(d > 0).mean():.2e}",
        flush=True,
    )
    assert d.max() <= 2, "luma kernel diverges from the XLA oracle on-chip"

    for rep in range(3):
        measure(f"[{rep}] lab  planar 5D", jax.jit(cg.clahe_rgb_u8_planar_gather5), xs)
        measure(f"[{rep}] luma planar 5D", jax.jit(cl.clahe_luma_rgb_u8_planar), xs)

    xs_nhwc = [x.transpose(0, 2, 3, 1) for x in xs]
    measure("lab  NHWC", jax.jit(cg.clahe_rgb_u8_gather), xs_nhwc)
    measure("luma NHWC", jax.jit(cl.clahe_luma_rgb_u8), xs_nhwc)

    xf = make_inputs(batch=B, n=6)
    measure("lab  f32 wrapper", jax.jit(cg.clahe_lab_rgb_gather), xf)
    measure("luma f32 wrapper", jax.jit(functools.partial(cl.clahe_luma_rgb)), xf)


@exp("lumastages")
def run_lumastages():
    """In-graph stage attribution for the luma-gain pipeline (cumulative
    prefixes, same process): luma pass -> +tables -> full, plus the apply
    kernel standalone on precomputed operands. The lumafast A/B measured
    ~2.65 ms/batch vs a ~1.3 ms op-count floor (luma ~0.1 + tables ~0.5 +
    apply ~0.7) — this locates the slack."""
    import retinex_tpu.ops.clahe_gather as cg
    import retinex_tpu.ops.clahe_luma as cl

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    hh, hw = H // NCY, W // NCX
    rows = hh * NCX
    area = (2 * hh) * (2 * hw)

    measure("full (baseline)", jax.jit(cl.clahe_luma_rgb_u8_planar), xs)

    @jax.jit
    def luma_only(xp):
        return cl._luma_u8(xp)

    measure("prefix: luma only", luma_only, xs)

    # Finer prefixes inside the tables stage (round-3 finding: tables is
    # ~1.66 ms of the 2.44 ms pipeline — locate it between the histogram,
    # the OpenCV LUT build, and the neighbour-select/byte-pack einsum).
    from retinex_tpu.ops.clahe_fast import _luts_from_hist
    from retinex_tpu.ops.clahe_gather import _hist_planar

    @jax.jit
    def luma_hist(xp):
        y = cl._luma_u8(xp)
        return y, _hist_planar(y, TILES, TILES)

    measure("prefix: luma+hist", luma_hist, xs)

    @jax.jit
    def luma_luts(xp):
        y = cl._luma_u8(xp)
        hist = _hist_planar(y, TILES, TILES)
        return y, _luts_from_hist(hist, 2.0, area)

    measure("prefix: luma+hist+lutbuild", luma_luts, xs)

    @jax.jit
    def luma_tables(xp):
        y = cl._luma_u8(xp)
        y_cells = y.reshape(B, NCY, hh, NCX, hw)
        return y, cg._tables_stage(y_cells, 2.0, TILES, TILES, area)

    measure("prefix: luma+tables", luma_tables, xs)

    # Apply kernel standalone: precomputed luma + tables, barriered so XLA
    # cannot fold the operand prep into the measured dispatch.
    ys = []
    for xp in xs:
        y = cl._luma_u8(xp)
        y_cells = y.reshape(B, NCY, hh, NCX, hw)
        luts = cg._tables_stage(y_cells, 2.0, TILES, TILES, area)
        ys.append((xp.reshape(B, 3, NCY, rows, hw), y.reshape(B, NCY, rows, hw), luts))

    @jax.jit
    def apply_only(args):
        rgb5, y5, luts = args
        return cl._apply_luma_stage5(rgb5, y5, luts, NCX, False)

    measure("apply standalone", apply_only, ys, batch=B)


@exp("lumasub")
def run_lumasub():
    """Decimated-histogram knob for the luma mode (hist_subsample): parity
    vs the XLA oracle on-chip first, then interleaved s=1 / s=2 / s=4 planar
    u8 A/B. The tables stage is ~1.5 ms of the 2.65 ms pipeline and its hist
    half scales with sampled pixels — s=2 reads 1/4 of them (quality on a
    real photo: 46-51 dB vs exact hist, tests/test_clahe_luma.py)."""
    import retinex_tpu.ops.clahe_luma as cl

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]

    for s in (2, 4):
        want = np.asarray(
            cl.clahe_luma_rgb_u8_xla(xs[0].transpose(0, 2, 3, 1), hist_subsample=s)
        ).astype(np.int32)
        got = (
            np.asarray(cl.clahe_luma_rgb_u8_planar(xs[0], hist_subsample=s))
            .transpose(0, 2, 3, 1)
            .astype(np.int32)
        )
        d = np.abs(want - got)
        print(
            f"s={s} on-chip parity vs XLA oracle: maxd {d.max()} "
            f"frac>0 {(d > 0).mean():.2e}",
            flush=True,
        )
        assert d.max() <= 2, f"s={s} kernel diverges from the XLA oracle on-chip"

    for rep in range(3):
        measure(f"[{rep}] luma s=1", jax.jit(cl.clahe_luma_rgb_u8_planar), xs)
        measure(
            f"[{rep}] luma s=2",
            jax.jit(functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=2)),
            xs,
        )
        measure(
            f"[{rep}] luma s=4",
            jax.jit(functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=4)),
            xs,
        )


@exp("labsub")
def run_labsub():
    """Decimated-histogram knob for the exact-Lab pipeline (hist_subsample
    threaded through clahe_rgb_u8_planar_gather5 / clahe_lab_rgb): on-chip
    parity vs the XLA path at each s first, then interleaved s=1/2/4 planar
    u8 and s=1/2 f32 A/Bs. The Lab tables stage is ~1.5 ms of the ~3.9 ms
    planar batch and its histogram half scales with sampled pixels."""
    from retinex_tpu.ops.clahe import clahe_lab_rgb
    from retinex_tpu.ops.clahe_gather import (
        clahe_lab_rgb_gather,
        clahe_rgb_u8_planar_gather5,
    )

    B = 8
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32) * 0.7)
    # Parity is judged RELATIVE to the s=1 gather-vs-XLA diff on the same
    # image: the fastmath fwd kernel's cbrt tie flips (+-1 L on ~8e-4 of
    # pixels of this adversarial random dark image) blow up to ~12 RGB
    # levels through the dark-end gamma slope at EVERY s — an absolute
    # maxd<=2 bar here just re-measures PARITY.md #19, not the knob. The
    # knob's own plumbing (decimated hist -> tables) was verified exact
    # on-chip (hist bit-match vs numpy bincount of the same kernel L).
    base = None
    for s in (1, 2, 4):
        want = np.asarray(clahe_lab_rgb(img, use_pallas=False, hist_subsample=s))
        got = np.asarray(clahe_lab_rgb_gather(img, hist_subsample=s))
        d = np.abs(want - got) * 255.0
        frac = (d > 0.5).mean()
        print(
            f"s={s} on-chip Lab parity vs XLA path: maxd {d.max():.2f} "
            f"frac>0.5 {frac:.2e}",
            flush=True,
        )
        if s == 1:
            base = (d.max(), frac)
        else:
            # +3: one extra LUT-slope level of headroom over the s=1 tail
            # (maxd landed exactly at base+2 once — u8 diffs in f32 carry
            # ~1e-6 epsilon, so an exact-boundary compare is a coin flip).
            assert d.max() <= base[0] + 3.0 and frac <= 5.0 * base[1] + 1e-4, (
                f"s={s} diverges beyond the s=1 fastmath budget {base}"
            )

    xs_u8 = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    xs_f32 = make_inputs(batch=B)
    for rep in range(3):
        for s in (1, 2, 4):
            measure(
                f"[{rep}] lab planar u8 s={s}",
                jax.jit(
                    functools.partial(clahe_rgb_u8_planar_gather5, hist_subsample=s)
                ),
                xs_u8,
            )
        for s in (1, 2):
            measure(
                f"[{rep}] lab f32 s={s}",
                jax.jit(functools.partial(clahe_lab_rgb_gather, hist_subsample=s)),
                xs_f32,
            )


@exp("cbrt3")
def run_cbrt3():
    """Third Newton step in the fwd kernel's `_fast_cbrt`: rel err drops
    ~2.3e-5 -> ~1e-9, killing the +-1 L quantization-tie flips (PARITY.md
    #19) — on an adversarial random dark image those amplify to ~12 RGB
    levels on 5e-3 of pixels through the dark-end gamma slope. Measures (a)
    gather-vs-XLA parity at 2 vs 3 iters and (b) the full-graph planar-u8
    cost, interleaved. Estimated cost: ~18 extra VPU slots/px in fwd
    (~0.2 ms/batch-8 at the measured 0.66 ps/slot)."""
    from retinex_tpu.ops import clahe_gather as cg
    from retinex_tpu.ops.clahe import clahe_lab_rgb

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32) * 0.7)
    want = np.asarray(clahe_lab_rgb(img, use_pallas=False))

    orig = cg._fast_cbrt

    # Explicit step counts: the module default flipped to 3 steps in round 3,
    # so aliasing `orig` as the 2-step variant would silently A/B 3 vs 3
    # (ADVICE r3). Both variants are self-contained.
    def make_cbrt(iters):
        def cbrt_n(x):
            xi = jax.lax.bitcast_convert_type(x, jnp.int32)
            third = (xi.astype(jnp.float32) * (1.0 / 3.0)).astype(jnp.int32)
            z = jax.lax.bitcast_convert_type(jnp.int32(0x54A232A3) - third, jnp.float32)
            for _ in range(iters):
                z = z * (4.0 - x * z * z * z) * (1.0 / 3.0)
            return x * z * z

        return cbrt_n

    variants = (("iters=2", make_cbrt(2)), ("iters=3", make_cbrt(3)))

    def activate(fn):
        cg._fast_cbrt = fn
        cg.clahe_rgb_u8_planar_gather5.clear_cache()
        cg.clahe_lab_rgb_gather.clear_cache()

    try:
        for name, fn in variants:
            activate(fn)
            got = np.asarray(cg.clahe_lab_rgb_gather(img))
            d = np.abs(want - got) * 255.0
            print(
                f"{name}: vs XLA maxd {d.max():.2f} frac>0.5 {(d > 0.5).mean():.2e}",
                flush=True,
            )
        xs_pl = [
            jnp.asarray(rng.integers(0, 256, (8, 3, H, W), dtype=np.uint8))
            for _ in range(4)
        ]
        for rep in range(3):
            for name, fn in variants:
                activate(fn)
                measure(f"[{rep}] planar u8 {name}", cg.clahe_rgb_u8_planar_gather5, xs_pl)
    finally:
        activate(orig)


@exp("bigframe")
def run_bigframe():
    """4K (2176x3840 letterboxed) classical throughput + the s=8 tail of the
    lumasub curve at 1080p. 4K needs tiles=16 for the gather kernels
    (hw = w/(2*tiles) must stay <= 128); cv2 semantics change with the tile
    grid, so this is the documented big-frame configuration, not a silent
    default switch."""
    import retinex_tpu.ops.clahe_gather as cg
    import retinex_tpu.ops.clahe_luma as cl

    H4, W4 = 2176, 3840  # 4K letterboxed to /32
    B4 = 2  # same pixel count per batch as 8x1080p
    rng = np.random.default_rng(0)
    xs4 = [
        jnp.asarray(rng.integers(0, 256, (B4, 3, H4, W4), dtype=np.uint8))
        for _ in range(6)
    ]
    assert cg.gather_supported(H4, W4, 16, 16)

    # On-chip parity at the 4K/tiles=16 shape first: this is the nb=2 band
    # blocking (the VMEM budget halves the 1080p nb=4), so it validates the
    # real Mosaic lowering of the small-band path, not just interpret mode.
    x0 = xs4[0][:1]
    want = np.asarray(
        cl.clahe_luma_rgb_u8_xla(x0.transpose(0, 2, 3, 1), tiles_x=16, tiles_y=16)
    ).astype(np.int32)
    got = (
        np.asarray(cl.clahe_luma_rgb_u8_planar(x0, tiles_x=16, tiles_y=16))
        .transpose(0, 2, 3, 1)
        .astype(np.int32)
    )
    d = np.abs(want - got)
    print(f"4K t16 luma parity vs XLA oracle: maxd {d.max()} frac>0 {(d > 0).mean():.2e}",
          flush=True)
    assert d.max() <= 2

    from retinex_tpu.ops.clahe import clahe_lab_rgb

    want_lab = np.asarray(clahe_lab_rgb(
        x0.transpose(0, 2, 3, 1).astype(jnp.float32) / 255.0,
        tiles=16, use_pallas=False,
    ))
    got_lab = np.asarray(
        cg.clahe_rgb_u8_planar_gather5(x0, tiles_x=16, tiles_y=16)
    ).transpose(0, 2, 3, 1).astype(np.float32) / 255.0
    d = np.abs(want_lab - got_lab) * 255.0
    print(
        f"4K t16 lab parity vs XLA path: maxd {d.max():.1f} "
        f"frac>0.5 {(d > 0.5).mean():.2e} frac>11 {(d > 11).mean():.2e}",
        flush=True,
    )
    # PARITY #19 fast-math budget: +-1 Lab tie flips amplify through the
    # near-cancelling inverse-colorspace rows at saturated-chroma pixels
    # (measured worst: u8 (8,192,236) -> 25 levels in R on synthetic noise;
    # isolated, frac>11 = 2.7e-5). Gate on the FRACTIONS, not the tail max.
    assert (d > 0.5).mean() < 1e-2 and (d > 11).mean() < 1e-4

    for rep in range(3):
        measure(
            f"[{rep}] 4K lab  t16",
            jax.jit(functools.partial(cg.clahe_rgb_u8_planar_gather5, tiles_x=16, tiles_y=16)),
            xs4,
        )
        measure(
            f"[{rep}] 4K luma t16",
            jax.jit(functools.partial(cl.clahe_luma_rgb_u8_planar, tiles_x=16, tiles_y=16)),
            xs4,
        )
        measure(
            f"[{rep}] 4K luma t16 s2",
            jax.jit(functools.partial(
                cl.clahe_luma_rgb_u8_planar, tiles_x=16, tiles_y=16, hist_subsample=2
            )),
            xs4,
        )

    xs = [
        jnp.asarray(rng.integers(0, 256, (8, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    for rep in range(2):
        measure(
            f"[{rep}] 1080p luma s=4",
            jax.jit(functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=4)),
            xs,
        )
        measure(
            f"[{rep}] 1080p luma s=8",
            jax.jit(functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=8)),
            xs,
        )


@exp("histrow")
def run_histrow():
    """Row-hist formulation vs the tile-transpose hist, in-graph (luma+tables
    prefix, interleaved). hist[tile] = sum over tile rows of per-(row, x-tile)
    16x16 nibble outer products — einsum contracts only the w axis (free
    view, NO u8 tile transpose), then a [*, th, *] f32 reduce. Trades the
    0.4 ms transpose for a 71 MB f32 intermediate (~0.17 ms at 830 GB/s) and
    a batched tiny-matmul lowering XLA may or may not like."""
    import retinex_tpu.ops.clahe_gather as cg
    import retinex_tpu.ops.clahe_luma as cl

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    hh, hw = H // NCY, W // NCX
    area = (2 * hh) * (2 * hw)

    def hist_rows(l_u8, tiles_y, tiles_x):
        b, h, w = l_u8.shape
        th, tw = h // tiles_y, w // tiles_x
        v = l_u8.reshape(b, h, tiles_x, tw).astype(jnp.int32)
        iota = jnp.arange(16, dtype=jnp.int32)
        hi = ((v >> 4)[..., None] == iota).astype(jnp.bfloat16)
        lo = ((v & 15)[..., None] == iota).astype(jnp.bfloat16)
        h16 = jnp.einsum(
            "bhxwi,bhxwj->bhxij", hi, lo, preferred_element_type=jnp.float32
        )
        hist = h16.reshape(b, tiles_y, th, tiles_x, 256).sum(axis=2)
        return hist.astype(jnp.int32)

    # Exactness first (counts are integers <= tile_area < 2^24; f32 exact).
    y0 = cl._luma_u8(xs[0])
    want = np.asarray(cg._hist_planar(y0, TILES, TILES))
    got = np.asarray(hist_rows(y0, TILES, TILES))
    np.testing.assert_array_equal(want, got)
    print("hist_rows exact vs _hist_planar", flush=True)

    @jax.jit
    def tables_current(xp):
        y = cl._luma_u8(xp)
        y_cells = y.reshape(B, NCY, hh, NCX, hw)
        return y, cg._tables_stage(y_cells, 2.0, TILES, TILES, area)

    orig = cg._hist_planar
    try:
        cg._hist_planar = lambda l, ty, tx: hist_rows(l, ty, tx)

        @jax.jit
        def tables_rowhist(xp):
            y = cl._luma_u8(xp)
            y_cells = y.reshape(B, NCY, hh, NCX, hw)
            return y, cg._tables_stage(y_cells, 2.0, TILES, TILES, area)

        _timed(tables_rowhist, xs, 1)  # trace+compile WHILE patched
    finally:
        cg._hist_planar = orig

    for rep in range(3):
        measure(f"[{rep}] luma+tables current", tables_current, xs)
        measure(f"[{rep}] luma+tables rowhist", tables_rowhist, xs)


@exp("lumafuse")
def run_lumafuse():
    """fuse_luma A/B: luma recomputed inside the apply kernel (y plane feeds
    only the histograms, fusing into the tile transpose) vs the y-operand
    kernel. Parity assert first, then interleaved timing."""
    import retinex_tpu.ops.clahe_luma as cl

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]

    want = np.asarray(cl.clahe_luma_rgb_u8_planar(xs[0])).astype(np.int32)
    got = np.asarray(cl.clahe_luma_rgb_u8_planar(xs[0], fuse_luma=True)).astype(np.int32)
    d = np.abs(want - got)
    print(f"on-chip fused-vs-base parity: maxd {d.max()} frac>0 {(d > 0).mean():.2e}", flush=True)
    assert d.max() <= 2, "fused luma kernel diverges on-chip"

    base = jax.jit(cl.clahe_luma_rgb_u8_planar)
    fused = jax.jit(functools.partial(cl.clahe_luma_rgb_u8_planar, fuse_luma=True))
    for rep in range(3):
        measure(f"[{rep}] luma base ", base, xs)
        measure(f"[{rep}] luma fused", fused, xs)


@exp("trainsplit")
def run_trainsplit():
    """Where does the train step go? Full 7-loss step vs no-perceptual (VGG
    off) vs forward+backward on a single cheap loss vs forward-only, f32 and
    bf16. 256px batch 4 (the bench shape)."""
    from retinex_tpu.config import Config
    from retinex_tpu.train.train_state import create_train_state, make_train_step
    from retinex_tpu.train.trainer import build_criterion

    rng = np.random.default_rng(0)
    size, batch = 256, 4
    xs = [
        jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32))
        for _ in range(6)
    ]

    for amp in (False, True):
        tag = "bf16" if amp else "f32"
        from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

        for variant, kw in (
            ("full 7-loss", {}),
            ("no perceptual (VGG off)", {"use_perceptual_loss": False}),
            (
                "exposure-only",
                {
                    "use_perceptual_loss": False,
                    "weight_smooth": 0.0,
                    "weight_col": 0.0,
                    "weight_spa": 0.0,
                    "weight_decouple": 0.0,
                },
            ),
        ):
            cfg = Config(use_preact=True, use_aspp=True, use_amp=amp, **kw)
            model = MultiScaleUPRetinex(
                use_preact=True, use_aspp=True, dtype=cfg.compute_dtype
            )
            state = create_train_state(
                model, jax.random.PRNGKey(0), (batch, size, size, 3), lambda s: 1e-4
            )
            step = make_train_step(model, build_criterion(cfg), mesh=None, donate=False)

            def f(x, state=state, step=step):
                new_state, loss_dict = step(state, x)
                return loss_dict["total"]

            measure(f"{tag} {variant}", f, xs, k_big=5, batch=batch)

        # forward-only floor
        cfg = Config(use_preact=True, use_aspp=True, use_amp=amp)
        model = MultiScaleUPRetinex(
            use_preact=True, use_aspp=True, dtype=cfg.compute_dtype
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )

        @jax.jit
        def fwd(x):
            return model.apply(variables, x, train=False)[0]

        measure(f"{tag} forward-only (eval)", fwd, xs, k_big=5, batch=batch)


@exp("trainpacked")
def run_trainpacked():
    """Standard vs s2d-packed train step (models/packed_train.py), interleaved
    same-process A/B (the only trustworthy comparison on axon). Full 7-loss
    step at the bench shape (256px b4) and a larger-batch point, f32 + bf16.
    Gates the Config.packed_train default."""
    from retinex_tpu.config import Config
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
    from retinex_tpu.train.train_state import create_train_state, make_train_step
    from retinex_tpu.train.trainer import build_criterion

    rng = np.random.default_rng(0)
    for size, batch in ((256, 4), (256, 16)):
        xs = [
            jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32))
            for _ in range(6)
        ]
        for amp in (False, True):
            tag = f"{'bf16' if amp else 'f32'} {size}px b{batch}"
            cfg = Config(use_preact=True, use_aspp=True, use_amp=amp)
            model = MultiScaleUPRetinex(
                use_preact=True, use_aspp=True, dtype=cfg.compute_dtype
            )
            criterion = build_criterion(cfg)
            state = create_train_state(
                model, jax.random.PRNGKey(0), (batch, size, size, 3), lambda s: 1e-4
            )
            steps = {
                "standard": make_train_step(model, criterion, mesh=None, donate=False),
                "packed": make_train_step(
                    model, criterion, mesh=None, donate=False, packed=True
                ),
            }
            fns = {}
            for name, step in steps.items():
                def f(x, state=state, step=step):
                    new_state, loss_dict = step(state, x)
                    return loss_dict["total"]
                fns[name] = f
            # interleave reps: std, packed, std, packed ...
            for rep in range(3):
                for name, f in fns.items():
                    measure(f"{tag} {name} (rep {rep})", f, xs, k_big=5, batch=batch)


@exp("barriers5")
def run_barriers5():
    """optimization_barrier placement in the 5D pipeline: the fwd->tables
    barrier (stages5: costs ~0.4 ms now that every stage is a pallas_call)
    and the tables-end barrier, all four combinations."""
    import retinex_tpu.ops.clahe_gather as cg

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    hh, hw = H // NCY, W // NCX
    rows = hh * NCX
    area = (2 * hh) * (2 * hw)

    def make(fwd_barrier, tables_barrier):
        def tables_nb(l_cells, clip, ty, tx, ar):
            b = l_cells.shape[0]
            h, w = NCY * hh, NCX * hw
            hist = cg._hist_planar(l_cells.reshape(b, h, w), ty, tx)
            import retinex_tpu.ops.clahe_fast as cf

            luts = cf._luts_from_hist(hist, clip, ar)
            luts_flat = luts.reshape(b, ty * tx, HIST_SIZE)
            t0y, t1y = cg._neighbor_index_tables(ty)
            t0x, t1x = cg._neighbor_index_tables(tx)
            n_cells, n_tiles = 4 * ty * tx, ty * tx

            def sel_matrix(tyv, txv):
                flat = (
                    np.asarray(tyv)[:, None] * tx + np.asarray(txv)[None, :]
                ).reshape(-1)
                s = np.zeros((n_tiles, n_cells), np.float32)
                s[flat, np.arange(n_cells)] = 1.0
                return jnp.asarray(s)

            lf = luts_flat.astype(jnp.float32)

            def select(s):
                return jnp.einsum(
                    "bte,tc->bce", lf, s, preferred_element_type=jnp.float32
                ).astype(jnp.int32)

            l00 = select(sel_matrix(t0y, t0x))
            l01 = select(sel_matrix(t0y, t1x))
            l10 = select(sel_matrix(t1y, t0x))
            l11 = select(sel_matrix(t1y, t1x))
            packed = l00 | (l01 << 8) | (l10 << 16) | (l11 << 24)
            out = packed.reshape(b, NCY, NCX, 2, 128)
            return jax.lax.optimization_barrier(out) if tables_barrier else out

        @jax.jit
        def f(xp):
            rgb5 = xp.reshape(B, 3, NCY, rows, hw)
            lab5 = cg._fwd_stage5(rgb5, False)
            if fwd_barrier:
                lab5 = jax.lax.optimization_barrier(lab5)
            l_cells = lab5[0].reshape(B, NCY, hh, NCX, hw)
            lane_luts = tables_nb(l_cells, 2.0, TILES, TILES, area)
            rgbp = cg._apply_stage5(lab5, lane_luts, NCX, False)
            return rgbp.reshape(B, 3, H, W)

        return f

    measure("fwd-bar + tab-bar (current)", make(True, True), xs)
    measure("no fwd-bar, tab-bar", make(False, True), xs)
    measure("fwd-bar, no tab-bar", make(True, False), xs)
    measure("no barriers", make(False, False), xs)


@exp("tables3")
def run_tables3():
    """In-graph decomposition of the tables stage by stubbing sub-parts in the
    FULL u8 planar pipeline (axon-reliable: only full-graph deltas): hist
    stubbed to a constant, LUT build stubbed to identity-cdf, selection
    matmuls stubbed to broadcast."""
    import retinex_tpu.ops.clahe_fast as cf
    import retinex_tpu.ops.clahe_gather as cg

    B = 8
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]

    full = jax.jit(
        lambda xp: cg.clahe_rgb_u8_planar_gather(xp)
    )
    measure("full (baseline)", full, xs)

    hh, hw = H // NCY, W // NCX
    area = (2 * hh) * (2 * hw)

    # variant A: hist replaced by a constant (removes one-hot compares + dot)
    real_hist = cg._hist_planar

    def const_hist(l_u8, ty, tx):
        b = l_u8.shape[0]
        base = (jnp.arange(HIST_SIZE, dtype=jnp.int32) % 7) * (area // 300)
        return jnp.broadcast_to(base, (b, ty, tx, HIST_SIZE)) + l_u8[
            :, :ty, :tx, None
        ].astype(jnp.int32)

    cg._hist_planar = const_hist
    try:
        f = jax.jit(lambda xp: cg.clahe_rgb_u8_planar_gather(xp))
        measure("full - hist stubbed", f, xs)
    finally:
        cg._hist_planar = real_hist

    # variant B: LUT build (clip/redistribute/cdf) replaced by identity LUT
    real_luts = cf._luts_from_hist

    def ident_luts(hist, clip_limit, tile_area):
        bins = jnp.arange(HIST_SIZE, dtype=jnp.int32)
        return jnp.broadcast_to(bins, hist.shape[:-1] + (HIST_SIZE,)) + (
            hist[..., :1] // tile_area
        )

    cg._luts_from_hist = ident_luts
    try:
        f = jax.jit(lambda xp: cg.clahe_rgb_u8_planar_gather(xp))
        measure("full - lutbuild stubbed", f, xs)
    finally:
        cg._luts_from_hist = real_luts

    # variant C: neighbour-selection matmuls replaced by a same-LUT broadcast
    def all_same(xp_u8):
        b = xp_u8.shape[0]
        rgb6 = xp_u8.reshape(B, 3, NCY, hh, NCX, hw)
        lab6 = cg._fwd_stage(rgb6, False)
        lab6 = jax.lax.optimization_barrier(lab6)
        hist = cg._hist_planar(lab6[0].reshape(b, H, W), TILES, TILES)
        luts = cf._luts_from_hist(hist, 2.0, area)
        lf = luts.reshape(b, TILES * TILES, HIST_SIZE)[:, :1]  # one LUT
        packed = lf | (lf << 8) | (lf << 16) | (lf << 24)
        packed = jnp.broadcast_to(
            packed.reshape(b, 1, 1, 2, 128), (b, NCY, NCX, 2, 128)
        )
        packed = jax.lax.optimization_barrier(packed)
        return cg._apply_stage(lab6, packed, False)

    measure("full - select stubbed", jax.jit(all_same), xs)


@exp("r4exact")
def run_r4exact():
    """Round-4 exact-path levers, A/B'd in the full graph (interleaved):

    (a) parity re-check after the division->reciprocal strength reduction in
        all four gather kernels (fastmath only; must stay inside the PARITY
        #19 budget: frac>0.5 ~1e-3, maxd <= ~8 on adversarial dark noise);
    (b) _HIST_CELLS: tile-transpose hist (False, current) vs direct cell-view
        einsum (True — kills the ~0.4 ms u8 transpose IF XLA fuses the
        operand transpose into the one-hot compares);
    (c) NHWC ingest back-to-back through the 6D core (current routing) and
        the 5D core, at the hist winner.
    """
    import retinex_tpu.ops.clahe_gather as cg
    from retinex_tpu.ops.clahe import clahe_lab_rgb

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32) * 0.7)
    want = np.asarray(clahe_lab_rgb(img, use_pallas=False))
    got = np.asarray(cg.clahe_lab_rgb_gather(img))
    d = np.abs(want - got) * 255.0
    print(
        f"recip-div parity vs XLA: maxd {d.max():.2f} frac>0.5 {(d > 0.5).mean():.2e}",
        flush=True,
    )

    xs_pl = [
        jnp.asarray(rng.integers(0, 256, (8, 3, H, W), dtype=np.uint8))
        for _ in range(4)
    ]
    xs_nhwc = [jnp.transpose(v, (0, 2, 3, 1)) for v in xs_pl]

    def set_hist(flag):
        cg._HIST_CELLS = flag
        cg.clahe_rgb_u8_planar_gather5.clear_cache()
        cg.clahe_rgb_u8_planar_gather6.clear_cache()
        cg.clahe_rgb_u8_gather.clear_cache()
        cg.clahe_lab_rgb_gather.clear_cache()

    # bit-identity of the two hist forms (cheap, on-chip)
    set_hist(False)
    a = np.asarray(cg.clahe_rgb_u8_planar_gather5(xs_pl[0]))
    set_hist(True)
    b = np.asarray(cg.clahe_rgb_u8_planar_gather5(xs_pl[0]))
    print(f"hist_cells bit-identity: maxd {np.abs(a.astype(int) - b.astype(int)).max()}",
          flush=True)

    try:
        for rep in range(3):
            for flag in (False, True):
                set_hist(flag)
                measure(
                    f"[{rep}] planar5 u8 hist_cells={flag}",
                    cg.clahe_rgb_u8_planar_gather5,
                    xs_pl,
                )
        # NHWC routing re-A/B at hist winner decided by the numbers above —
        # run both hist settings for NHWC too (cheap: 2x2 variants).
        for rep in range(3):
            for flag in (False, True):
                set_hist(flag)
                measure(
                    f"[{rep}] NHWC u8 6Dcore hist_cells={flag}",
                    cg.clahe_rgb_u8_gather,
                    xs_nhwc,
                )

                @jax.jit
                def nhwc_5d(x):
                    xp = x.transpose(0, 3, 1, 2)
                    return cg.clahe_rgb_u8_planar_gather5(xp).transpose(0, 2, 3, 1)

                measure(f"[{rep}] NHWC u8 5Dcore hist_cells={flag}", nhwc_5d, xs_nhwc)
    finally:
        set_hist(False)


@exp("r4luma")
def run_r4luma():
    """Round-4 luma-mode levers toward a robust >=5,000 fps median:

    (a) fused+decimated luma at s in {1,2,4}: fuse_luma=True now computes
        luma ONLY on the histogram's decimated pixels (16x less luma work at
        s=4) — bit-identity vs the unfused path checked on-chip first;
    (b) interleaved medians of unfused vs fused at each s;
    (c) batch scaling b16 at the s=4 winner (fixed-overhead amortization —
        the lean pipeline is ~1.7 ms/batch where dispatch floors matter).
    """
    from retinex_tpu.ops.clahe_luma import clahe_luma_rgb_u8_planar

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (8, 3, H, W), dtype=np.uint8))
        for _ in range(4)
    ]

    for s in (1, 2, 4):
        a = np.asarray(clahe_luma_rgb_u8_planar(xs[0], hist_subsample=s))
        b = np.asarray(
            clahe_luma_rgb_u8_planar(xs[0], hist_subsample=s, fuse_luma=True)
        )
        print(
            f"s={s} fused-vs-unfused maxd "
            f"{np.abs(a.astype(int) - b.astype(int)).max()}",
            flush=True,
        )

    for rep in range(3):
        for s in (1, 2, 4):
            measure(
                f"[{rep}] luma s={s} unfused",
                functools.partial(clahe_luma_rgb_u8_planar, hist_subsample=s),
                xs,
            )
            measure(
                f"[{rep}] luma s={s} fused-dec",
                functools.partial(
                    clahe_luma_rgb_u8_planar, hist_subsample=s, fuse_luma=True
                ),
                xs,
            )

    xs16 = [
        jnp.asarray(rng.integers(0, 256, (16, 3, H, W), dtype=np.uint8))
        for _ in range(4)
    ]
    for rep in range(3):
        for fused in (False, True):
            measure(
                f"[{rep}] b16 luma s=4 fused={fused}",
                functools.partial(
                    clahe_luma_rgb_u8_planar, hist_subsample=4, fuse_luma=fused
                ),
                xs16,
                batch=16,
            )


@exp("r4tab")
def run_r4tab():
    """Fused Pallas tables kernel A/B (round 4): the post-histogram table
    build (clip/redistribute/CDF/round/select/pack) as ONE program per image
    (`cg._TABLES_KERNEL=True`) vs the ~15-dispatch XLA chain. Bit-identity
    checked on-chip first; then interleaved medians across the exact planar
    pipeline, the luma mode at s=1/4 (fused+unfused luma), and 4K (tiles=16
    compile + shape check).
    """
    import retinex_tpu.ops.clahe_gather as cg
    from retinex_tpu.ops.clahe_luma import clahe_luma_rgb_u8_planar

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (8, 3, H, W), dtype=np.uint8))
        for _ in range(4)
    ]

    def set_tab(flag):
        cg._TABLES_KERNEL = flag
        cg.clahe_rgb_u8_planar_gather5.clear_cache()
        cg.clahe_rgb_u8_planar_gather6.clear_cache()
        cg.clahe_rgb_u8_gather.clear_cache()
        clahe_luma_rgb_u8_planar.clear_cache()

    try:
        # on-chip bit-identity: exact pipeline + luma at s=1 and s=4
        set_tab(False)
        a1 = np.asarray(cg.clahe_rgb_u8_planar_gather5(xs[0]))
        a2 = np.asarray(clahe_luma_rgb_u8_planar(xs[0]))
        a3 = np.asarray(clahe_luma_rgb_u8_planar(xs[0], hist_subsample=4))
        set_tab(True)
        b1 = np.asarray(cg.clahe_rgb_u8_planar_gather5(xs[0]))
        b2 = np.asarray(clahe_luma_rgb_u8_planar(xs[0]))
        b3 = np.asarray(clahe_luma_rgb_u8_planar(xs[0], hist_subsample=4))
        for tag, a, b in (("exact", a1, b1), ("luma", a2, b2), ("luma-s4", a3, b3)):
            print(
                f"tables-kernel bit-identity {tag}: "
                f"maxd {np.abs(a.astype(int) - b.astype(int)).max()}",
                flush=True,
            )

        for rep in range(3):
            for flag in (False, True):
                set_tab(flag)
                measure(f"[{rep}] exact planar5 tabkernel={flag}",
                        cg.clahe_rgb_u8_planar_gather5, xs)
                measure(f"[{rep}] luma s=1 tabkernel={flag}",
                        clahe_luma_rgb_u8_planar, xs)
                measure(
                    f"[{rep}] luma s=4 tabkernel={flag}",
                    functools.partial(clahe_luma_rgb_u8_planar, hist_subsample=4),
                    xs,
                )
                measure(
                    f"[{rep}] luma s=4 fused tabkernel={flag}",
                    functools.partial(
                        clahe_luma_rgb_u8_planar, hist_subsample=4, fuse_luma=True
                    ),
                    xs,
                )

        # 4K tiles=16 (n_tiles=256, n_cells=1024): compile + parity + timing
        xs4k = [
            jnp.asarray(rng.integers(0, 256, (2, 3, 2176, 3840), dtype=np.uint8))
            for _ in range(4)
        ]
        set_tab(False)
        a = np.asarray(clahe_luma_rgb_u8_planar(xs4k[0], tiles_x=16, tiles_y=16))
        set_tab(True)
        b = np.asarray(clahe_luma_rgb_u8_planar(xs4k[0], tiles_x=16, tiles_y=16))
        print(
            f"tables-kernel 4K bit-identity: "
            f"maxd {np.abs(a.astype(int) - b.astype(int)).max()}",
            flush=True,
        )
        for rep in range(2):
            for flag in (False, True):
                set_tab(flag)
                measure(
                    f"[{rep}] 4K luma t16 tabkernel={flag}",
                    functools.partial(clahe_luma_rgb_u8_planar, tiles_x=16, tiles_y=16),
                    xs4k,
                    batch=2,
                )
    finally:
        set_tab(False)


@exp("r4b")
def run_r4b():
    """Round-4 second wave (on top of _HIST_CELLS + _TABLES_KERNEL defaults):

    (a) _HIST_I8: int8 one-hot histogram operands (half the materialized
        dot-operand traffic) on the exact pipeline and luma s=1;
    (b) _RECIP_GAIN: division-free luma gain via a 256-entry reciprocal
        lane table, luma s=1/s=4;
    (c) combined flags at luma s=4 (the 5,000-fps bench point);
    (d) in-graph prefix envelope of luma s=4 at the winners: luma pass only,
        +hist, +tables kernel, full — locates the gap between the ~0.9 ms
        op-count floor and the measured ~1.9 ms.
    """
    import retinex_tpu.ops.clahe_gather as cg
    import retinex_tpu.ops.clahe_luma as cl

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (8, 3, H, W), dtype=np.uint8))
        for _ in range(4)
    ]

    def clear():
        cg.clahe_rgb_u8_planar_gather5.clear_cache()
        cl.clahe_luma_rgb_u8_planar.clear_cache()

    def set_flags(i8=False, recip=False):
        cg._HIST_I8 = i8
        cl._RECIP_GAIN = recip
        clear()

    try:
        # on-chip bit-identity of the i8 hist (recip checked vs oracle on CPU)
        set_flags()
        a1 = np.asarray(cg.clahe_rgb_u8_planar_gather5(xs[0]))
        set_flags(i8=True)
        b1 = np.asarray(cg.clahe_rgb_u8_planar_gather5(xs[0]))
        print(f"i8-hist bit-identity exact: maxd "
              f"{np.abs(a1.astype(int) - b1.astype(int)).max()}", flush=True)

        for rep in range(3):
            for i8 in (False, True):
                set_flags(i8=i8)
                measure(f"[{rep}] exact planar5 i8={i8}",
                        cg.clahe_rgb_u8_planar_gather5, xs)
                measure(f"[{rep}] luma s=1 i8={i8}", cl.clahe_luma_rgb_u8_planar, xs)
            for recip in (False, True):
                set_flags(recip=recip)
                measure(
                    f"[{rep}] luma s=4 recip={recip}",
                    functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=4),
                    xs,
                )
            set_flags(i8=True, recip=True)
            measure(
                f"[{rep}] luma s=4 i8+recip",
                functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=4),
                xs,
            )

        # (d) in-graph prefix envelope at luma s=4, default flags
        set_flags()
        s = 4
        ncy, ncx = 2 * TILES, 2 * TILES
        hh, hw = H // ncy, W // ncx
        rows = hh * ncx

        @jax.jit
        def p_luma(xp):
            return cl._luma_u8(xp)

        @jax.jit
        def p_hist(xp):
            y = cl._luma_u8(xp)
            yc = y.reshape(8, ncy, hh, ncx, hw)[:, :, ::s, :, ::s]
            return cg._hist_cells(yc, TILES, TILES)

        @jax.jit
        def p_tables(xp):
            y = cl._luma_u8(xp)
            yc = y.reshape(8, ncy, hh, ncx, hw)[:, :, ::s, :, ::s]
            area = 4 * yc.shape[2] * yc.shape[4]
            return cg._tables_stage(yc, 2.0, TILES, TILES, area)

        for rep in range(3):
            measure(f"[{rep}] s4 prefix: luma", p_luma, xs)
            measure(f"[{rep}] s4 prefix: +hist", p_hist, xs)
            measure(f"[{rep}] s4 prefix: +tables", p_tables, xs)
            measure(
                f"[{rep}] s4 prefix: full",
                functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=4),
                xs,
            )
    finally:
        set_flags()


@exp("netroof")
def run_netroof():
    """Whole-graph roofline for the packed net path (VERDICT r3 item 7):
    per-stage ms on-chip AND per-stage FLOPs via CPU-backend cost analysis
    -> achieved TF/s per stage, so '36 fps/chip is the emitter ceiling' is
    an audited claim rather than an extrapolation from FAM1 alone.
    RETINEX_PERF_BATCH overrides the batch (default 8, the production point).
    """
    from retinex_tpu.models.packed_inference import PackedRetinex, _conv_auto
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
    from retinex_tpu.ops.resize import resize_bilinear, resize_scale
    from retinex_tpu.ops.s2d import s2d

    batch = int(os.environ.get("RETINEX_PERF_BATCH", "8"))
    dtype = jnp.bfloat16
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    pk = PackedRetinex(model, variables)

    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32), dtype=dtype)
        for _ in range(3)
    ]
    xps = [s2d(x).astype(dtype) for x in inputs]

    @jax.jit
    def full(x):
        return pk(x)[0]

    @jax.jit
    def ie_fullres(xp):
        x1p = _conv_auto(xp, pk.k_input, bias=pk.b_input, relu=True)
        x2 = pk._enc1(x1p)
        d1p = pk._dec1(x2 * 0.5) + x1p
        r = _conv_auto(d1p, pk.k_rescv, bias=pk.b_rescv, relu=True)
        return _conv_auto(r, pk.k_resout, bias=pk.b_resout)

    @jax.jit
    def ie_middle(xp):
        x1p = _conv_auto(xp, pk.k_input, bias=pk.b_input, relu=True)
        x2 = pk._enc1(x1p)
        return model.apply(variables, x2, False, method=lambda m, a, t: m.ie_net.middle(a, t))

    @jax.jit
    def scale1_conv(xp):
        return _conv_auto(xp, pk.k_s1conv, bias=pk.b_s1conv, relu=True)

    f1s = [scale1_conv(xp) for xp in xps]

    @jax.jit
    def fam_only(f1p):
        return pk._fam_packed(f1p, pk.fam1)

    @jax.jit
    def scale23(x):
        h, w = x.shape[1], x.shape[2]
        x2s = resize_scale(x, 0.5)
        x3s = resize_scale(x, 0.25)
        f2 = model.apply(variables, x2s, method=lambda m, a: m.scale2(a))
        f3 = model.apply(variables, x3s, method=lambda m, a: m.scale3(a))
        return s2d(resize_bilinear(f2, h, w)), s2d(resize_bilinear(f3, h, w))

    stages = [
        ("full packed graph", full, inputs),
        ("ie full-res (in+enc1+dec1+head)", ie_fullres, xps),
        ("ie enc1+middle (enc2/3+bottleneck)", ie_middle, xps),
        ("scale1 conv", scale1_conv, xps),
        ("scale1 FAM", fam_only, f1s),
        ("scale2/3 towers+resizes", scale23, inputs),
    ]

    def stage_flops(fn, sample):
        try:
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                return float(
                    fn.lower(jax.device_put(sample, cpu)).compile().cost_analysis()["flops"]
                )
        except Exception as e:
            print(f"  (cost analysis failed: {type(e).__name__}: {e})", flush=True)
            return None

    results = []
    for rep in range(3):
        for name, fn, ins in stages:
            dt = measure(f"[{rep}] {name}", fn, ins, batch=batch)
            results.append((name, dt))

    print("\n--- roofline table (median ms, FLOPs from CPU cost analysis) ---",
          flush=True)
    for name, fn, ins in stages:
        ts = sorted(dt for n, dt in results if n == name)
        med = ts[len(ts) // 2]
        fl = stage_flops(fn, ins[0])
        tfs = (fl / med) / 1e12 if fl else float("nan")
        mxu = tfs / 197.0 * 100.0 if fl else float("nan")
        print(
            f"{name:38s} {med * 1e3:8.2f} ms  "
            f"{(fl or 0) / 1e9:9.1f} GFLOP  {tfs:6.1f} TF/s  {mxu:5.1f}% MXU",
            flush=True,
        )


@exp("r4c")
def run_r4c():
    """Masked-lane histogram decimation A/B (round 4): the production
    pipelines now decimate columns via the in-contraction lane mask
    (`cg._hist_dot lane_stride`) instead of a `[..., ::s]` lane-axis gather.
    Compare against a local replica of the old materialized-slice pipeline,
    bit-identity first; plus the exact path at s=1 (mask inactive — guards
    against a regression from the plumbing).
    """
    import retinex_tpu.ops.clahe_gather as cg
    import retinex_tpu.ops.clahe_luma as cl

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (8, 3, H, W), dtype=np.uint8))
        for _ in range(4)
    ]
    ncy, ncx = 2 * TILES, 2 * TILES
    hh, hw = H // ncy, W // ncx
    rows = hh * ncx

    def old_luma(xp, s):
        b = xp.shape[0]
        y = cl._luma_u8(xp)
        y_cells = y.reshape(b, ncy, hh, ncx, hw)[:, :, ::s, :, ::s]
        area = 4 * y_cells.shape[2] * y_cells.shape[4]
        luts = cg._tables_stage(y_cells, 2.0, TILES, TILES, area)
        rgb5 = xp.reshape(b, 3, ncy, rows, hw)
        y5 = y.reshape(b, ncy, rows, hw)
        return cl._apply_luma_stage5(rgb5, y5, luts, ncx).reshape(b, 3, H, W)

    for s in (2, 4):
        a = np.asarray(cl.clahe_luma_rgb_u8_planar(xs[0], hist_subsample=s))
        b_ = np.asarray(jax.jit(functools.partial(old_luma, s=s))(xs[0]))
        print(
            f"masked-vs-sliced s={s} bit-identity: maxd "
            f"{np.abs(a.astype(int) - b_.astype(int)).max()}",
            flush=True,
        )

    for rep in range(3):
        for s in (2, 4):
            measure(
                f"[{rep}] luma s={s} masked (new)",
                functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=s),
                xs,
            )
            measure(
                f"[{rep}] luma s={s} sliced (old)",
                jax.jit(functools.partial(old_luma, s=s)),
                xs,
            )
        measure(f"[{rep}] exact planar5 s=1", cg.clahe_rgb_u8_planar_gather5, xs)
        measure(f"[{rep}] luma s=1", cl.clahe_luma_rgb_u8_planar, xs)

    # Barriers on/off at the fused-tables graph + NHWC routing re-check
    # (the official bench u8 metric is NHWC ingest).
    xs_nhwc = [jnp.transpose(v, (0, 2, 3, 1)) for v in xs]

    @jax.jit
    def nhwc_5d(x):
        xp = x.transpose(0, 3, 1, 2)
        return cg.clahe_rgb_u8_planar_gather5(xp).transpose(0, 2, 3, 1)

    def set_barriers(flag):
        cg._BARRIERS = flag
        cg.clahe_rgb_u8_planar_gather5.clear_cache()
        cg.clahe_rgb_u8_gather.clear_cache()
        cl.clahe_luma_rgb_u8_planar.clear_cache()
        nhwc_5d.clear_cache()

    try:
        set_barriers(False)
        a = np.asarray(cg.clahe_rgb_u8_planar_gather5(xs[0]))
        set_barriers(True)
        b2 = np.asarray(cg.clahe_rgb_u8_planar_gather5(xs[0]))
        print(f"barriers on/off bit-identity: maxd "
              f"{np.abs(a.astype(int) - b2.astype(int)).max()}", flush=True)
        for rep in range(3):
            for flag in (True, False):
                set_barriers(flag)
                measure(f"[{rep}] exact planar5 barriers={flag}",
                        cg.clahe_rgb_u8_planar_gather5, xs)
                measure(
                    f"[{rep}] luma s=4 barriers={flag}",
                    functools.partial(cl.clahe_luma_rgb_u8_planar, hist_subsample=4),
                    xs,
                )
                measure(f"[{rep}] NHWC 6Dcore barriers={flag}",
                        cg.clahe_rgb_u8_gather, xs_nhwc)
                measure(f"[{rep}] NHWC 5Dcore barriers={flag}", nhwc_5d, xs_nhwc)
    finally:
        set_barriers(True)


@exp("r4remat")
def run_r4remat():
    """640px packed bf16 train step with rematerialized stages
    (models/packed_train.py ckpt wrappers): does remat's HBM cut buy a batch
    size the non-remat step can't reach (b16 OOMs at compile, b12 is a layout
    cliff — BENCH_NOTES round 4)? Interleaved same-process A/B at b8, plus
    the b16-remat point that has no non-remat counterpart."""
    from retinex_tpu.config import Config
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
    from retinex_tpu.train.train_state import create_train_state, make_train_step
    from retinex_tpu.train.trainer import build_criterion

    size = 640
    rng = np.random.default_rng(0)
    cfg = Config(use_preact=True, use_aspp=True, use_amp=True)
    criterion = build_criterion(cfg)

    def build(batch, remat):
        model = MultiScaleUPRetinex(
            use_preact=True, use_aspp=True, dtype=cfg.compute_dtype, remat=remat
        )
        state = create_train_state(
            model, jax.random.PRNGKey(0), (batch, size, size, 3), lambda s: 1e-4
        )
        step = make_train_step(model, criterion, mesh=None, donate=False, packed=True)

        def f(x, state=state, step=step):
            new_state, loss_dict = step(state, x)
            return loss_dict["total"]

        return f

    xs8 = [jnp.asarray(rng.random((8, size, size, 3), dtype=np.float32) * 0.6)
           for _ in range(4)]
    fns8 = {"b8 std": build(8, False), "b8 remat": build(8, True)}
    for rep in range(3):
        for name, f in fns8.items():
            measure(f"640px packed bf16 {name} (rep {rep})", f, xs8, k_big=4, batch=8)
    del fns8, xs8

    xs16 = [jnp.asarray(rng.random((16, size, size, 3), dtype=np.float32) * 0.6)
            for _ in range(4)]
    f16 = build(16, True)
    for rep in range(3):
        measure(f"640px packed bf16 b16 remat (rep {rep})", f16, xs16, k_big=4, batch=16)


@exp("trainroof")
def run_trainroof():
    """Backward-pass roofline for the 640px b8 packed bf16 train step
    (VERDICT r4 item 5): per-stage forward and forward+vjp wall times
    on-chip plus CPU-backend XLA cost analysis of the SAME jitted fns ->
    backward-only ms / GFLOP / TF/s per stage, attributing the
    18.9%-MFU-vs-39.7%-inference-ceiling gap stage by stage (the netroof
    methodology extended to grads). Stages mirror
    models/packed_train.packed_train_apply's decomposition; stage returns
    DROP the BN-stat updates (they receive no cotangent in the real step)
    and running stats are closed over (not differentiated), so each vjp
    computes exactly the real step's backward work for that stage: input
    grads AND weight grads. RETINEX_PERF_BATCH overrides the batch.
    """
    from retinex_tpu.config import Config
    from retinex_tpu.models import packed_train as pt
    from retinex_tpu.models.packed_inference import _interleave_packed
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
    from retinex_tpu.ops.s2d import (
        conv_s2d,
        d2s,
        pack_kernel_s1_t,
        pack_pointwise_t,
        s2d,
        s2d_upsample_mxu,
    )
    from retinex_tpu.train.train_state import create_train_state, make_train_step
    from retinex_tpu.train.trainer import build_criterion

    size = int(os.environ.get("RETINEX_PERF_SIZE", "640"))  # /32-divisible
    batch = int(os.environ.get("RETINEX_PERF_BATCH", "8"))
    dtype = jnp.bfloat16
    cfg = Config(use_preact=True, use_aspp=True, use_amp=True)
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3), lambda s: 1e-4
    )
    params, stats = state.params, state.batch_stats
    criterion = build_criterion(cfg)
    loss_state = state.loss_state
    ie, ie_s = params["ie_net"], stats["ie_net"]
    key = jax.random.PRNGKey(7)
    rng_np = np.random.default_rng(0)

    hp = size // 2  # packed (s2d) resolution

    # 4 distinct inputs >= k_big: no dispatch in a slope window repeats an
    # earlier one, so axon cannot short-circuit it (the n=3 first run showed
    # a 0.00 ms scale2 fwd — a deduped repeat).
    N_IN = 4

    def rnd(shape, d=dtype, scale=1.0, n=N_IN):
        return [
            jnp.asarray(rng_np.random(shape, dtype=np.float32) * scale, dtype=d)
            for _ in range(n)
        ]

    def zipped(*lists):
        return [tuple(t) for t in zip(*lists)]

    # ---- stage fns: fn(diff_inputs, nondiff_inputs, diff_params) ----
    # diff/nondiff split mirrors the REAL step's backward: the batch x and
    # anything derived from it by data-prep ops (s2d, resize, pool) is a
    # LEAF — XLA never computes dL/dx there — so those tensors are nondiff
    # here too (the first trainroof run differentiated them, inflating e.g.
    # the loss stage with a spurious VGG(img_low) backward).
    def st_fullres(diff, nondiff, p):
        (xp_,) = nondiff
        x1p_ = jax.nn.relu(
            conv_s2d(xp_, pack_kernel_s1_t(p["input_layer"]["kernel"]),
                     bias=p["input_layer"]["bias"])
        )
        x2_, _ = pt._enc_block_train(x1p_, p["enc1"], ie_s["enc1"], model.use_preact)
        return x1p_, x2_

    def st_enc2(diff, nondiff, p):
        (x2p_,) = diff
        x3_, _ = pt._enc_block_train(x2p_, p, ie_s["enc2"], model.use_preact)
        return x3_

    def st_inner(diff, nondiff, p):
        (x3_,) = diff
        d3_, _ = model.apply(
            {"params": p, "batch_stats": stats},
            x3_,
            True,
            method=lambda m, a, t: m.ie_net.inner(a, t),
            mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        return d3_

    def st_dec2(diff, nondiff, p):
        d3_, x2p_ = diff
        dec2_out_, _ = pt._up_block_train(d3_, p, ie_s["dec2"])
        return d2s(dec2_out_ + x2p_)

    def st_dec1(diff, nondiff, p):
        d2_, x1p_ = diff
        (x_,) = nondiff
        dec1_out_, _ = pt._up_block_train(d2_, p["dec1"], ie_s["dec1"])
        d1p_ = dec1_out_ + x1p_
        r_ = jax.nn.relu(
            conv_s2d(d1p_, pack_kernel_s1_t(p["residual_conv"]["kernel"]),
                     bias=p["residual_conv"]["bias"])
        )
        res_p_ = conv_s2d(r_, pack_pointwise_t(p["residual_out"]["kernel"]),
                          bias=p["residual_out"]["bias"])
        mean_p_ = s2d(jnp.mean(x_, axis=-1, keepdims=True))
        return d2s(jax.nn.sigmoid(mean_p_ + res_p_))

    def st_tower(diff, nondiff, p):
        (inp,) = nondiff  # both towers eat data-derived (leaf) inputs
        f = jax.nn.relu(
            conv_s2d(inp, pack_kernel_s1_t(p["conv"]["kernel"]), bias=p["conv"]["bias"])
        )
        return pt._fam_train(f, p["fam"])

    def st_fusion(diff, nondiff, p):
        f1p_, f2p_, f3_ = diff
        f2_ = d2s(f2p_)
        f2ps_ = s2d_upsample_mxu(f2_, 4, mode=1).astype(dtype)
        f3ps_ = s2d_upsample_mxu(f3_, 16, mode=1).astype(dtype)
        fused_ = _interleave_packed([f1p_, f2ps_, f3ps_], 32)
        fused_ = conv_s2d(fused_, pack_pointwise_t(p["fusion"]["kernel"]),
                          bias=p["fusion"]["bias"])
        return d2s(jax.nn.sigmoid(
            conv_s2d(fused_, pack_pointwise_t(p["output_layer"]["kernel"]),
                     bias=p["output_layer"]["bias"])
        ))

    def make_st_loss(crit):
        def st_loss(diff, nondiff, p):
            enhanced_, refl_, illu_ = diff
            (x_,) = nondiff
            del p
            total, _, _ = crit(x_, enhanced_, illu_, refl_, loss_state)
            return total

        return st_loss

    # Context rows FIRST, alone on the chip: the full train step's working
    # set is most of HBM at 640px b8 — measuring it with every stage's input
    # list resident OOMed the first run.
    @jax.jit
    def full_fwd(x):
        (enh, _, _), _ = pt.packed_train_apply(model, params, stats, x, key)
        return enh

    step = make_train_step(model, criterion, mesh=None, donate=False, packed=True)

    def full_step(x):
        _, loss_dict = step(state, x)
        return loss_dict["total"]

    xs = rnd((batch, size, size, 3), jnp.float32, 0.6)
    results = {}
    for name, fn in (("full packed fwd", full_fwd), ("full train step", full_step)):
        for rep in range(3):
            try:
                results.setdefault(name, []).append(
                    measure(f"[{rep}] {name}", fn, xs, k_big=4, batch=batch)
                )
            except Exception as e:
                print(f"[{rep}] {name} FAILED: {type(e).__name__}: {e}", flush=True)
    del step, full_step, full_fwd

    # Loss-component variants (shipping = perceptual ON freq OFF): the first
    # run put the criterion at fwd 55 / f+b 186 ms — a quarter of the step —
    # so attribute WITHIN it too.
    from retinex_tpu.train.trainer import build_criterion as _bc

    crit_nop = _bc(Config(use_preact=True, use_aspp=True, use_amp=True,
                          use_perceptual_loss=False))
    crit_freq = _bc(Config(use_preact=True, use_aspp=True, use_amp=True,
                           use_freq_loss=True))

    xps = [s2d(x).astype(dtype) for x in xs]
    loss_diff = zipped(
        rnd((batch, size, size, 3), jnp.float32, 1.0),
        rnd((batch, size, size, 3), jnp.float32, 1.0),
        rnd((batch, size, size, 1), jnp.float32, 1.0),
    )
    loss_datas = [(d, (x,)) for d, x in zip(loss_diff, xs)]
    stages = [
        ("full-res encode (in+enc1)", st_fullres,
         [((), (xp,)) for xp in xps], ie),
        ("enc2", st_enc2,
         [((a,), ()) for a in rnd((batch, hp // 2, hp // 2, 256))], ie["enc2"]),
        ("inner (enc3..dec3+ASPP, flax)", st_inner,
         [((a,), ()) for a in rnd((batch, hp // 2, hp // 2, 128))], params),
        ("dec2 + skip", st_dec2,
         [(d, ()) for d in zipped(rnd((batch, hp // 2, hp // 2, 128)),
                                  rnd((batch, hp // 2, hp // 2, 256)))], ie["dec2"]),
        ("dec1 + illumination head", st_dec1,
         [(d, (x,)) for d, x in zip(zipped(rnd((batch, hp, hp, 64)),
                                           rnd((batch, hp, hp, 128))), xs)], ie),
        ("scale1 conv+FAM", st_tower,
         [((), (xp,)) for xp in xps], params["scale1"]),
        ("scale2 conv+FAM", st_tower,
         [((), (a,)) for a in rnd((batch, hp // 4, hp // 4, 12))],
         params["scale2"]),
        ("fusion head", st_fusion,
         [(d, ()) for d in zipped(rnd((batch, hp, hp, 128)),
                                  rnd((batch, hp // 4, hp // 4, 128)),
                                  rnd((batch, hp // 8, hp // 8, 32)))], params),
        ("7-loss criterion", make_st_loss(criterion), loss_datas, None),
        ("criterion, no perceptual", make_st_loss(crit_nop), loss_datas, None),
        ("criterion + freq loss", make_st_loss(crit_freq), loss_datas, None),
    ]

    built = []
    for name, fn, datas, pa in stages:
        fwd = jax.jit(lambda data, fn=fn, pa=pa: fn(data[0], data[1], pa))

        def fb_(data, fn=fn, pa=pa):
            diff, nondiff = data
            out, pull = jax.vjp(lambda d, p: fn(d, nondiff, p), diff, pa)
            cts = jax.tree.map(jnp.ones_like, out)
            g = pull(cts)
            return sum(
                jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(g)
            )

        built.append((name, fwd, jax.jit(fb_), datas))

    for rep in range(3):
        for name, fwd, fb, datas in built:
            try:
                results.setdefault(name + " [fwd]", []).append(
                    measure(f"[{rep}] {name} fwd", fwd, datas, k_big=4, batch=batch)
                )
                results.setdefault(name + " [f+b]", []).append(
                    measure(f"[{rep}] {name} f+b", fb, datas, k_big=4, batch=batch)
                )
            except Exception as e:
                print(f"[{rep}] {name} FAILED: {type(e).__name__}: {e}", flush=True)

    def flops_of(fn, sample):
        try:
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                return float(
                    fn.lower(jax.device_put(sample, cpu)).compile().cost_analysis()[
                        "flops"
                    ]
                )
        except Exception as e:
            print(f"  (cost analysis failed: {type(e).__name__}: {e})", flush=True)
            return None

    print("\n--- backward roofline (median ms; FLOPs from CPU cost analysis; "
          "bwd = [f+b] - [fwd]) ---", flush=True)

    def med(key_):
        ts = sorted(results.get(key_, []))
        return ts[len(ts) // 2] if ts else None

    for name, fwd, fb, datas in built:
        mf, mb = med(name + " [fwd]"), med(name + " [f+b]")
        if mf is None or mb is None:
            print(f"{name:32s} (no measurements)", flush=True)
            continue
        bwd_ms = max(mb - mf, 1e-9)
        ff, fbf = flops_of(fwd, datas[0]), flops_of(fb, datas[0])
        if ff is not None and fbf is not None:
            bflop = max(fbf - ff, 0.0)
            tfs = bflop / bwd_ms / 1e12
            print(
                f"{name:32s} fwd {mf * 1e3:7.2f}  f+b {mb * 1e3:7.2f}  "
                f"bwd {bwd_ms * 1e3:7.2f} ms  {bflop / 1e9:8.1f} GFLOP  "
                f"{tfs:6.1f} TF/s  {tfs / 197 * 100:5.1f}% MXU",
                flush=True,
            )
        else:
            print(
                f"{name:32s} fwd {mf * 1e3:7.2f}  f+b {mb * 1e3:7.2f}  "
                f"bwd {bwd_ms * 1e3:7.2f} ms  (no cost analysis)",
                flush=True,
            )
    mfull, mstep = med("full packed fwd"), med("full train step")
    print(
        f"full packed fwd {mfull * 1e3 if mfull else float('nan'):7.2f} ms; "
        f"full train step {mstep * 1e3 if mstep else float('nan'):7.2f} ms",
        flush=True,
    )


@exp("r5exact")
def run_r5exact():
    """Exact-parity u8 pipeline: fwd/apply band-count re-sweep at the round-4
    defaults (_HIST_CELLS/_TABLES_KERNEL/_HIST_I8 all on) plus a barrier
    re-check — VERDICT r4 item 3's named candidates for the remaining
    apply-stage headroom (~0.9-1.2 ms by the r4 envelope). Every variant is
    bit-identity-asserted on-chip before timing; all variants interleave in
    ONE process (the only trustworthy A/B on axon). Each variant's jit is
    traced eagerly while its flags are set, so flag flips don't invalidate
    already-built variants.

    Phase 2 calibrates the slope window: the exact pipelines ride a +-15%
    between-process band while luma modes tightened to single digits
    (BENCH_NOTES r4); if a longer k_big window (17 vs 9) shrinks the
    within-process rep spread, bench.py should adopt it.
    """
    import retinex_tpu.ops.clahe_gather as cg

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(0, 256, (8, 3, H, W), dtype=np.uint8))
        for _ in range(6)
    ]
    xs_nhwc = [jnp.transpose(x, (0, 2, 3, 1)) for x in xs]

    def set_nb(fwd=None, ap=None, barriers=True):
        cg._FWD_NB, cg._APPLY_NB, cg._BARRIERS = fwd, ap, barriers

    variants = [
        ("default (fwd4, apply4)", None, None, True),
        ("apply nb2", None, 2, True),
        ("apply nb8", None, 8, True),
        ("fwd nb2", 2, None, True),
        ("fwd2 + apply2", 2, 2, True),
        ("fwd8 + apply8", 8, 8, True),
        ("no barriers", None, None, False),
    ]
    raw5 = cg.clahe_rgb_u8_planar_gather5.__wrapped__
    raw_nhwc = cg.clahe_rgb_u8_gather.__wrapped__

    ref = None
    fns = []
    try:
        for name, f_, a_, bar in variants:
            set_nb(f_, a_, bar)
            fn = jax.jit(lambda xp, raw5=raw5: raw5(xp))
            try:
                out = np.asarray(fn(xs[0]))  # traces under this variant's flags
            except Exception as e:  # e.g. nb8 scoped-VMEM OOM at 1080p
                msg = str(e).splitlines()[0][:160]
                print(f"{name}: SKIPPED (compile failed: {msg})", flush=True)
                continue
            if ref is None:
                ref = out
            else:
                maxd = np.abs(out.astype(np.int32) - ref.astype(np.int32)).max()
                print(f"{name}: parity maxd {maxd}", flush=True)
                assert maxd == 0, f"{name} not bit-identical: maxd {maxd}"
            fns.append((name, fn, xs))
        set_nb()
        fn_nhwc = jax.jit(lambda x, raw=raw_nhwc: raw(x))
        fn_nhwc(xs_nhwc[0])
        fns.append(("NHWC ingest (default)", fn_nhwc, xs_nhwc))

        for rep in range(3):
            for name, fn, ins in fns:
                measure(f"[{rep}] {name}", fn, ins)

        # Phase 2: slope-window calibration on the default pipeline.
        print("--- k_big calibration (per-rep ms, default exact planar) ---",
              flush=True)
        fn0 = fns[0][1]
        for k_big in (9, 17):
            ts = []
            for _ in range(5):
                t1 = _timed(fn0, xs, 1)
                t2 = _timed(fn0, xs, k_big)
                ts.append((t2 - t1) / (k_big - 1) * 1e3)
            med = sorted(ts)[2]
            spread = (max(ts) - min(ts)) / med
            print(
                f"k_big={k_big:2d}: reps {' '.join(f'{t:.2f}' for t in ts)} ms  "
                f"median {med:.2f}  spread {spread:.2f}",
                flush=True,
            )
    finally:
        set_nb()


@exp("r5loss")
def run_r5loss():
    """Follow-ups to the trainroof table (BENCH_NOTES r5): (a) per-loss
    attribution of the criterion's 23.8 ms non-VGG forward at 640px b8 —
    trainsplit's 256px 'losses are free' verdict does not transfer; (b) the
    fusion head is the only backward stage under 20% MXU (15.2%, 7.4 ms) —
    apply the forward lever inventory: ups_mode 0/1/2 on its s2d upsamples,
    fwd and fwd+vjp, interleaved.
    """
    from retinex_tpu.losses import losses as L
    from retinex_tpu.models.packed_inference import _interleave_packed
    from retinex_tpu.ops.s2d import conv_s2d, d2s, pack_pointwise_t, s2d_upsample_mxu
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
    from retinex_tpu.train.train_state import create_train_state

    size = int(os.environ.get("RETINEX_PERF_SIZE", "640"))
    batch = int(os.environ.get("RETINEX_PERF_BATCH", "8"))
    dtype = jnp.bfloat16
    rng_np = np.random.default_rng(0)

    def rnd(shape, d=jnp.float32, n=4):
        return [
            jnp.asarray(rng_np.random(shape, dtype=np.float32), dtype=d)
            for _ in range(n)
        ]

    xs = rnd((batch, size, size, 3))
    enh = rnd((batch, size, size, 3))
    illu = rnd((batch, size, size, 1))

    loss_fns = [
        ("exposure", lambda d: L.exposure_loss(d[0], d[1])),
        ("smoothness (dynamic TV)", lambda d: L.smoothness_loss(d[2], d[1])),
        ("color", lambda d: L.color_loss(d[0])),
        ("spatial consistency", lambda d: L.spatial_consistency_loss(d[0], d[1])),
        ("decoupling", lambda d: L.decoupling_loss(d[2], d[0])),
        ("frequency (opt-in)", lambda d: L.frequency_loss(d[0], d[1])),
    ]
    datas = [tuple(t) for t in zip(enh, xs, illu)]
    fns = [(name, jax.jit(f)) for name, f in loss_fns]
    for rep in range(3):
        for name, f in fns:
            try:
                measure(f"[{rep}] loss:{name}", f, datas, k_big=4, batch=batch)
            except Exception as e:
                print(f"[{rep}] loss:{name} FAILED: {e}", flush=True)

    # (b) fusion-head ups_mode sweep, fwd + vjp.
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=dtype)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3), lambda s: 1e-4
    )
    p_fu = state.params["fusion"]
    p_out = state.params["output_layer"]
    hp = size // 2

    def fusion(diff, mode):
        f1p_, f2p_, f3_ = diff
        f2_ = d2s(f2p_)
        f2ps_ = s2d_upsample_mxu(f2_, 4, mode=mode).astype(dtype)
        f3ps_ = s2d_upsample_mxu(f3_, 16, mode=mode).astype(dtype)
        fused_ = _interleave_packed([f1p_, f2ps_, f3ps_], 32)
        fused_ = conv_s2d(fused_, pack_pointwise_t(p_fu["kernel"]),
                          bias=p_fu["bias"])
        return d2s(jax.nn.sigmoid(
            conv_s2d(fused_, pack_pointwise_t(p_out["kernel"]), bias=p_out["bias"])
        ))

    fdatas = [
        tuple(t)
        for t in zip(
            rnd((batch, hp, hp, 128), dtype),
            rnd((batch, hp // 4, hp // 4, 128), dtype),
            rnd((batch, hp // 8, hp // 8, 32), dtype),
        )
    ]
    fus = []
    for mode in (0, 1, 2):
        fwd = jax.jit(lambda d, m=mode: fusion(d, m))

        def fb_(d, m=mode):
            out, pull = jax.vjp(lambda dd: fusion(dd, m), d)
            g = pull(jnp.ones_like(out))
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))

        fus.append((mode, fwd, jax.jit(fb_)))
    for rep in range(3):
        for mode, fwd, fb in fus:
            try:
                measure(f"[{rep}] fusion ups_mode={mode} fwd", fwd, fdatas,
                        k_big=4, batch=batch)
                measure(f"[{rep}] fusion ups_mode={mode} f+b", fb, fdatas,
                        k_big=4, batch=batch)
            except Exception as e:
                print(f"[{rep}] fusion mode={mode} FAILED: {e}", flush=True)


@exp("r5smooth")
def run_r5smooth():
    """Why is smoothness_loss 22 ms at 640px b8 (r5loss — 9% of the train
    step, vs ~0 for every other cheap loss)? Hypothesis: its Sobel runs as a
    1-channel depthwise conv — a pathological TPU shape (C=1 NHWC conv).
    Probe: the full loss, the sobel term alone, a shift-add separable sobel
    (same correlation arithmetic as the conv, reassociated), and the full
    loss with the shift-add sobel patched in; fwd and f+b, interleaved.
    """
    from retinex_tpu.losses import losses as L
    from retinex_tpu.ops.filters import sobel_edge_map

    size, batch = 640, 8
    rng_np = np.random.default_rng(0)

    def rnd(shape, n=4):
        return [
            jnp.asarray(rng_np.random(shape, dtype=np.float32)) for _ in range(n)
        ]

    xs = rnd((batch, size, size, 3))
    illu = rnd((batch, size, size, 1))
    datas = [tuple(t) for t in zip(illu, xs)]

    def sobel_edge_map_shift(x):
        gray = jnp.mean(x, axis=-1, keepdims=True)
        xp = jnp.pad(gray, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        s = xp[:, :-2] + 2.0 * xp[:, 1:-1] + xp[:, 2:]
        gx = s[:, :, 2:] - s[:, :, :-2]
        d = xp[:, 2:] - xp[:, :-2]
        gy = d[:, :, :-2] + 2.0 * d[:, :, 1:-1] + d[:, :, 2:]
        return jnp.sqrt(gx * gx + gy * gy)

    # parity of the shift form vs the conv form
    a = np.asarray(jax.jit(sobel_edge_map)(xs[0]))
    b_ = np.asarray(jax.jit(sobel_edge_map_shift)(xs[0]))
    rel = np.abs(a - b_).max() / max(np.abs(a).max(), 1e-9)
    print(f"sobel shift-vs-conv max rel diff: {rel:.2e}", flush=True)

    def smooth_patched(d):
        old = L.sobel_edge_map
        L.sobel_edge_map = sobel_edge_map_shift
        try:
            return L.smoothness_loss(d[0], d[1])
        finally:
            L.sobel_edge_map = old

    def fb(f):
        def g(d):
            out, pull = jax.vjp(lambda i: f((i, d[1])), d[0])
            return jnp.sum(pull(jnp.ones_like(out))[0].astype(jnp.float32))

        return g

    base = lambda d: L.smoothness_loss(d[0], d[1])  # noqa: E731
    variants = [
        ("smoothness (conv sobel)", jax.jit(base)),
        ("smoothness (shift sobel)", jax.jit(smooth_patched)),
        ("sobel_edge_map conv only", jax.jit(lambda d: sobel_edge_map(d[1]))),
        ("sobel shift only", jax.jit(lambda d: sobel_edge_map_shift(d[1]))),
        ("smoothness f+b (conv)", jax.jit(fb(base))),
        ("smoothness f+b (shift)", jax.jit(fb(smooth_patched))),
    ]
    for rep in range(3):
        for name, f in variants:
            try:
                measure(f"[{rep}] {name}", f, datas, k_big=4, batch=batch)
            except Exception as e:
                print(f"[{rep}] {name} FAILED: {e}", flush=True)


def main():
    names = sys.argv[1:] or ["base"]
    if names == ["all"]:
        names = list(EXPERIMENTS)
    print(f"platform: {jax.devices()[0].platform}  experiments: {names}", flush=True)
    for n in names:
        print(f"--- {n} ---", flush=True)
        EXPERIMENTS[n]()


if __name__ == "__main__":
    main()
