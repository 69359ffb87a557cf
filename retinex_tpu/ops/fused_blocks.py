"""Whole-block fused Pallas kernels for the packed net path.

BENCH_NOTES.md round-2: replacing SINGLE convs with pallas_call is
net-negative (each call pays an XLA pad copy and two fusion breaks), but the
FAM's two conv chains are 1.23 TFLOP/batch(2) at 1080p and XLA runs them at
~46 TF/s with a 267 MB HBM round trip between the stages. Fusing a whole
chain into one kernel keeps the intermediate activations in VMEM and runs
each tap as ONE [rows*cols, Cin] @ [Cin, Cout] MXU dot over the whole tile
(the conv_pallas schedule, ~91 TF/s standalone) — per-row dots reload the
MXU weights every row and measured no faster than XLA.

Kernels:
- `fam_dual_conv3`: y = relu(conv3x3(x, k1) + b1) (Cout 256 = the b3/b4 first
  convs stacked), then two parallel 3x3 convs on y's halves -> [*, 256]
  (b3_out | b4_out). Implements the FAM branch3/branch4 chains of
  models/packed_inference._fam_packed (reference: models/model.py:11-97
  EnhancedFAM branches; dilation-2 is already folded into the packed taps).
- `dec1_chain`: d2 -> 1x1 -> 3x3 -> 3x3 (+x1p residual) -> 3x3 tail — the
  dec1 UpBlock + residual_conv chain (reference: models/model.py:254-274 +
  :345-349), BN affines pre-folded into kernels/biases by the caller.
- `fam_conv_fused`: the FAM's WHOLE conv stage — all four branches, the 3x3
  max pool, and the fusion 1x1 (folded into each branch since pointwise-
  after-conv == conv with transformed Cout) — in one kernel returning the
  post-fusion ReLU tensor. No branch intermediate ever hits HBM (the XLA
  formulation round-trips ~2 GB/batch of [*, 128] branch tensors).
- `fam_tail_stats` / `fam_tail_apply`: the FAM attention tail's elementwise
  stages (reference: models/model.py:60-97 — CA scale, per-pixel channel
  mean/max for SA, final SA scale) on the PACKED [*, 4*32] tensor. XLA runs
  these as ~7 ms of relayout-bound passes at 1080p (the [*, 4, 32] block
  reshapes force lane regrouping, scripts/probe_tail.py); each kernel is one
  clean read->write pass with the 32-lane-group reductions/broadcasts done
  by static lane slices in VMEM.

Zero-padding semantics: each stage's 'SAME' zero padding is reproduced by
masking the intermediate activations to zero outside the true image before
the next stage consumes them (a valid-conv over a pre-padded input would
otherwise leak nonzero ghost values into the next stage's halo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(n: int) -> int:
    return -(-n // 8) * 8


# Multi-stage in-kernel chains (dec1_chain, fam_conv_fused) hold two
# stages' halos in VMEM, so their width tiles cap below the single-stage
# kernels' 256. One constant shared by each kernel AND its *_supported
# gate — a round-2 advisor finding was a gate/kernel bw_max mismatch that
# crashed with bw=None on widths only the larger cap accepted.
CHAIN_BW_MAX = 192


def _pick_tiles(h: int, w: int, bw_max: int = 256):
    bh = next((d for d in (8, 16, 4, 2) if h % d == 0), None)
    bw = next(
        (d for d in (256, 240, 224, 192, 160, 128, 96, 64) if d <= bw_max and w % d == 0),
        None,
    )
    return bh, bw


def _dot(a, k):
    return jax.lax.dot_general(
        a, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tap_conv(src, kref, rows, cols, cin_lo, cin, cout, kp):
    """Sum of kp*kp shifted full-tile dots: [rows*cols, cin] @ [cin, cout]."""
    acc = jnp.zeros((rows * cols, cout), jnp.float32)
    for u in range(kp):
        for v in range(kp):
            a = src[u : u + rows, v : v + cols, cin_lo : cin_lo + cin].reshape(
                rows * cols, cin
            )
            acc = acc + _dot(a, kref[u, v])
    return acc


def _edge_mask(rows, cols, gy0, gx0, h, w):
    gy = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 0) + gy0
    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 1) + gx0
    return (gy >= 0) & (gy < h) & (gx >= 0) & (gx < w)


def _fam_kernel(bh, bw, h, w, x_ref, k1_ref, b1_ref, k2a_ref, b2a_ref,
                k2b_ref, b2b_ref, o_ref, xs, ys, sem):
    """One program: output tile [bh, bw, 256] = (b3|b4) of one image.

    x_ref: [B, H+4, Wp, 128] HBM (pre-padded 2 rows/cols each side);
    k1_ref [3,3,128,256], k2a/k2b [3,3,128,128] VMEM; b* [1, C] f32;
    xs: VMEM [bh+4, sw, 128]; ys: VMEM [bh+2, sw, 256] (stage-1 activations).
    """
    ib, ih, iw = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cin = xs.shape[2]

    copy = pltpu.make_async_copy(
        x_ref.at[ib, pl.ds(ih * bh, bh + 4), pl.ds(iw * bw, xs.shape[1]), :], xs, sem
    )
    copy.start()
    copy.wait()

    rows1, cols1 = bh + 2, bw + 2
    acc = _tap_conv(xs, k1_ref, rows1, cols1, 0, cin, 256, 3)
    acc = jnp.maximum(acc + b1_ref[0][None, :], 0.0).reshape(rows1, cols1, 256)
    ok = _edge_mask(rows1, cols1, ih * bh - 1, iw * bw - 1, h, w)
    ys[0:rows1, 0:cols1, :] = jnp.where(ok, acc, 0.0).astype(ys.dtype)

    for off, kref, bref in ((0, k2a_ref, b2a_ref), (cin, k2b_ref, b2b_ref)):
        acc = _tap_conv(ys, kref, bh, bw, off, cin, cin, 3)
        acc = (acc + bref[0][None, :]).reshape(bh, bw, cin)
        o_ref[:, :, off : off + cin] = acc.astype(o_ref.dtype)


def fam_dual_supported(x_shape) -> bool:
    _, h, w, c = x_shape
    if c != 128:
        return False
    bh, bw = _pick_tiles(h, w)
    return bh is not None and bw is not None


def dec1_chain_supported(x_shape) -> bool:
    """Mirror dec1_chain's own tile pick (bw_max=CHAIN_BW_MAX): widths divisible by
    224/240/256 but none of {192,...,64} pass fam_dual_supported yet crash
    dec1_chain with bw=None."""
    _, h, w, _ = x_shape
    bh, bw = _pick_tiles(h, w, bw_max=CHAIN_BW_MAX)
    return bh is not None and bw is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def fam_dual_conv3(x, k1, b1, k2a, b2a, k2b, b2b, interpret: bool = False):
    """(relu(conv3x3(x,k1)+b1)) -> conv3x3 halves -> [*, 256] = (out_a|out_b).

    x: [B,H,W,128]; k1: [3,3,128,256]; k2a/k2b: [3,3,128,128]; biases f32.
    Torch-parity 'SAME' zero padding per stage, stride 1, exact up to float
    reassociation (f32 tap accumulation, bf16 stage handoff like XLA).
    """
    b, h, w, cin = x.shape
    bh, bw = _pick_tiles(h, w)
    sw = _round8(bw + 4)
    wp = (w // bw - 1) * bw + sw
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, wp - w - 2), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_fam_kernel, bh, bw, h, w),
        grid=(b, h // bh, w // bw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (None, bh, bw, 256), lambda ib, ih, iw: (ib, ih, iw, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 256), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 4, sw, cin), x.dtype),
            pltpu.VMEM((bh + 2, sw, 256), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * 512,
            bytes_accessed=x.size * x.dtype.itemsize * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xp,
        k1.astype(x.dtype), jnp.asarray(b1, jnp.float32).reshape(1, 256),
        k2a.astype(x.dtype), jnp.asarray(b2a, jnp.float32).reshape(1, 128),
        k2b.astype(x.dtype), jnp.asarray(b2b, jnp.float32).reshape(1, 128),
    )
    return out


def _dec1_kernel(bh, bw, h, w, d2_ref, x1p_ref, kup_ref, bup_ref, kc1_ref,
                 bc1_ref, kc2_ref, bc2_ref, krc_ref, brc_ref, o_ref,
                 ds, rs, y1, y2, y3, sems):
    """dec1 UpBlock + residual + residual_conv chain, one [bh, bw, 128] tile.

    Stages (offsets relative to the output tile's first row gy0 = ih*bh):
      y1[r1] (r1 in [0,bh+6), gy = gy0+r1-3) = 1x1(d2) + b_up
      y2[r2] (gy = gy0+r2-2) = relu(3x3(y1) + b_c1)           [BN folded]
      y3[r3] (gy = gy0+r3-1) = relu(3x3(y2) + b_c2) + x1p     [BN folded]
      out[r] = relu(3x3(y3) + b_rc)
    Each stage's activations are masked to zero outside the true image so the
    next stage sees exact 'SAME' zero padding. x1p arrives pre-padded with
    zeros, so the residual add keeps the ghost region zero.
    """
    ib, ih, iw = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cin = ds.shape[2]

    c_d2 = pltpu.make_async_copy(
        d2_ref.at[ib, pl.ds(ih * bh, bh + 6), pl.ds(iw * bw, ds.shape[1]), :],
        ds, sems.at[0],
    )
    c_x1 = pltpu.make_async_copy(
        x1p_ref.at[ib, pl.ds(ih * bh, bh + 2), pl.ds(iw * bw, rs.shape[1]), :],
        rs, sems.at[1],
    )
    c_d2.start()
    c_x1.start()
    c_d2.wait()
    c_x1.wait()

    rows1, cols1 = bh + 6, bw + 6
    acc = _tap_conv(ds, kup_ref, rows1, cols1, 0, cin, 128, 1)
    acc = (acc + bup_ref[0][None, :]).reshape(rows1, cols1, 128)
    ok = _edge_mask(rows1, cols1, ih * bh - 3, iw * bw - 3, h, w)
    y1[0:rows1, 0:cols1, :] = jnp.where(ok, acc, 0.0).astype(y1.dtype)

    rows2, cols2 = bh + 4, bw + 4
    acc = _tap_conv(y1, kc1_ref, rows2, cols2, 0, 128, 128, 3)
    acc = jnp.maximum(acc + bc1_ref[0][None, :], 0.0).reshape(rows2, cols2, 128)
    ok = _edge_mask(rows2, cols2, ih * bh - 2, iw * bw - 2, h, w)
    y2[0:rows2, 0:cols2, :] = jnp.where(ok, acc, 0.0).astype(y2.dtype)

    rows3, cols3 = bh + 2, bw + 2
    acc = _tap_conv(y2, kc2_ref, rows3, cols3, 0, 128, 128, 3)
    acc = jnp.maximum(acc + bc2_ref[0][None, :], 0.0).reshape(rows3, cols3, 128)
    ok = _edge_mask(rows3, cols3, ih * bh - 1, iw * bw - 1, h, w)
    masked = jnp.where(ok, acc, 0.0)
    y3[0:rows3, 0:cols3, :] = (
        masked + rs[0:rows3, 0:cols3, :].astype(jnp.float32)
    ).astype(y3.dtype)

    acc = _tap_conv(y3, krc_ref, bh, bw, 0, 128, 128, 3)
    acc = jnp.maximum(acc + brc_ref[0][None, :], 0.0)
    o_ref[...] = acc.reshape(bh, bw, 128).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dec1_chain(d2, x1p, k_up, b_up, k_c1, b_c1, k_c2, b_c2, k_rc, b_rc,
               interpret: bool = False):
    """r = relu(conv3x3(relu(conv3x3(relu(conv3x3(1x1(d2)+b)))) + x1p)) — the
    packed dec1 UpBlock (BN affines folded into kernels/biases by the caller),
    the +x1p residual, and the residual_conv, fused into one kernel.

    d2: [B,H,W,64]; x1p: [B,H,W,128]; k_up [1,1,64,128]; k_c1/k_c2/k_rc
    [3,3,128,128]; biases f32. Returns r: [B,H,W,128].
    """
    b, h, w, cin0 = d2.shape
    bh, bw = _pick_tiles(h, w, bw_max=CHAIN_BW_MAX)
    sw = _round8(bw + 6)
    wp = (w // bw - 1) * bw + sw
    # Mosaic DMA slices need the minor dim 128-tile aligned: pad the 64-ch
    # input (and the matching kernel rows) with zeros.
    cpad = 128 - cin0 if cin0 < 128 else 0
    d2p = jnp.pad(d2, ((0, 0), (3, 3), (3, wp - w - 3), (0, cpad)))
    k_up = jnp.pad(k_up, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    sw2 = _round8(bw + 2)
    wp2 = (w // bw - 1) * bw + sw2
    x1pp = jnp.pad(x1p, ((0, 0), (1, 1), (1, wp2 - w - 1), (0, 0)))

    def f32b(v, n):
        return jnp.asarray(v, jnp.float32).reshape(1, n)

    out = pl.pallas_call(
        functools.partial(_dec1_kernel, bh, bw, h, w),
        grid=(b, h // bh, w // bw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(
            (None, bh, bw, 128), lambda ib, ih, iw: (ib, ih, iw, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 128), d2.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 6, sw, d2p.shape[-1]), d2.dtype),
            pltpu.VMEM((bh + 2, sw2, 128), x1p.dtype),
            pltpu.VMEM((bh + 6, sw, 128), d2.dtype),
            pltpu.VMEM((bh + 4, sw, 128), d2.dtype),
            pltpu.VMEM((bh + 2, sw, 128), d2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * (64 * 128 + 3 * 9 * 128 * 128),
            bytes_accessed=x1p.size * x1p.dtype.itemsize * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        d2p, x1pp,
        k_up.astype(d2.dtype), f32b(b_up, 128),
        k_c1.astype(d2.dtype), f32b(b_c1, 128),
        k_c2.astype(d2.dtype), f32b(b_c2, 128),
        k_rc.astype(d2.dtype), f32b(b_rc, 128),
    )
    return out


def _pick_rows(h: int, w: int):
    """Rows per block, bounded so the kernel's vreg-padded f32 temporaries
    (the four per-quadrant 32-lane slices pad to full 128-lane vregs, ~9x the
    block bytes) stay inside the v5e 16 MB scoped VMEM."""
    cap = max(12_000_000 // (w * 128 * 4 * 9), 1)
    return next((d for d in (8, 4, 2, 1) if d <= cap and h % d == 0), None)


def fam_tail_supported(x_shape) -> bool:
    _, h, w, c = x_shape
    return c == 128 and w % 8 == 0 and _pick_rows(h, w) is not None


def _ca8(ca_vec):
    """[B, 128] f32 -> [B, 8, 128] (sublane-replicated for the VMEM block)."""
    v = jnp.asarray(ca_vec, jnp.float32)
    return jnp.broadcast_to(v[:, None, :], (v.shape[0], 8, 128))


def _tail_stats_kernel(x_ref, ca_ref, o_ref):
    """sa_in tile [bh, W, 8] = per-quadrant channel mean/max of x * ca.

    x_ref: [bh, W, 128] bf16 (packed FAM fusion output, quadrant-major
    channel blocks of 32); ca_ref: [8, 128] f32 (sigmoid channel attention,
    quadrant-tiled, sublane-replicated); o_ref: [bh, W, 8] = (a0,m0,a1,m1,a2,m2,a3,m3)
    matching jnp.stack([avg, max], -1).reshape(..., 8).
    """
    x = x_ref[...] * ca_ref[0][None, None, :].astype(x_ref.dtype)
    parts = []
    for q in range(4):
        sl = x[:, :, 32 * q : 32 * (q + 1)].astype(jnp.float32)
        parts.append(jnp.mean(sl, axis=-1, keepdims=True))
        parts.append(jnp.max(sl, axis=-1, keepdims=True))
    o_ref[...] = jnp.concatenate(parts, axis=-1).astype(o_ref.dtype)


def _tail_apply_kernel(x_ref, ca_ref, sa_ref, o_ref):
    """out tile = x * ca * sa_broadcast (sa per quadrant -> its 32 lanes)."""
    x = x_ref[...] * ca_ref[0][None, None, :].astype(x_ref.dtype)
    sa = sa_ref[...].astype(x.dtype)  # [bh, W, 4]
    rep = jnp.concatenate(
        [jnp.broadcast_to(sa[:, :, q : q + 1], (*x.shape[:2], 32)) for q in range(4)],
        axis=-1,
    )
    o_ref[...] = x * rep


@functools.partial(jax.jit, static_argnames=("interpret",))
def fam_tail_stats(x, ca_vec, interpret: bool = False):
    """[B,H,W,128] x, [B,128] ca -> [B,H,W,8] SA conv input (mean|max pairs)."""
    b, h, w, _ = x.shape
    bh = _pick_rows(h, w)
    return pl.pallas_call(
        _tail_stats_kernel,
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((None, bh, w, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # ca replicated to 8 sublanes: Mosaic requires the block's
            # second-minor dim be a multiple of 8 (or the full array dim).
            pl.BlockSpec((None, 8, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bh, w, 8), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 8), x.dtype),
        interpret=interpret,
    )(x, _ca8(ca_vec))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fam_tail_apply(x, ca_vec, sa, interpret: bool = False):
    """[B,H,W,128] x, [B,128] ca, [B,H,W,4] sa -> x * ca * sa (per quadrant)."""
    b, h, w, _ = x.shape
    bh = _pick_rows(h, w)
    return pl.pallas_call(
        _tail_apply_kernel,
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((None, bh, w, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bh, w, 4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bh, w, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 128), x.dtype),
        interpret=interpret,
    )(x, _ca8(ca_vec), sa)


def _fam_conv_kernel(bh, bw, h, w, x_ref, ka_ref, kb_ref, k1_ref, b1_ref,
                     k32_ref, k42_ref, bt_ref, o_ref, xs, ys, sem):
    """One program: FAM fusion output tile [bh, bw, 128] (pre-attention).

    Computes relu( x@A + maxpool3x3(x)@B + conv3(y3, k32') + conv3(y4, k42')
    + bias_total ) where (y3|y4) = relu(conv3(x, k1) + b1) — the four FAM
    branches with the fusion 1x1 folded into each branch (pointwise-after-
    conv == conv with transformed Cout; constant terms folded into bias_total
    by the caller). All convs are PACKED 3-tap kernels (the original
    dilation-2 branch4 conv folds to dense packed taps). Requires x >= 0 (the
    FAM input is post-ReLU) so the zero HBM padding is also correct 'SAME'
    padding for the max pool.

    x_ref: [B, H+4, Wp, 128] HBM (pre-padded 2 rows/cols each side);
    ka/kb: [128, 128] (folded 1x1s); k1: [3,3,128,256]; b1: [1,256] f32;
    k32/k42: [3,3,128,128] (fusion-folded); bt: [1,128] f32;
    xs: VMEM [bh+4, sw, 128]; ys: VMEM [bh+2, sw, 256].
    """
    ib, ih, iw = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cin = xs.shape[2]

    copy = pltpu.make_async_copy(
        x_ref.at[ib, pl.ds(ih * bh, bh + 4), pl.ds(iw * bw, xs.shape[1]), :], xs, sem
    )
    copy.start()
    copy.wait()

    # Stage 1: y3|y4 with halo 1 for the second convs.
    rows1, cols1 = bh + 2, bw + 2
    acc = _tap_conv(xs, k1_ref, rows1, cols1, 0, cin, 256, 3)
    acc = jnp.maximum(acc + b1_ref[0][None, :], 0.0).reshape(rows1, cols1, 256)
    ok = _edge_mask(rows1, cols1, ih * bh - 1, iw * bw - 1, h, w)
    ys[0:rows1, 0:cols1, :] = jnp.where(ok, acc, 0.0).astype(ys.dtype)

    m = bh * bw
    # Branch 1: center x @ A (x tile offset 2).
    xc = xs[2 : 2 + bh, 2 : 2 + bw, :].reshape(m, cin)
    acc = _dot(xc, ka_ref[...])

    # Branch 2: 3x3 max pool (separable) then @ B. Packed-space pool per
    # ORIGINAL pixel: row pass mixes the a-quadrant lane halves, column pass
    # the b-quadrant 32-lane groups (ops/s2d.maxpool3x3_s1_s2d semantics).
    c = cin // 4  # 32
    up, mid, dn = (xs[1 + k : 1 + k + bh, 1 : 1 + bw + 2, :] for k in range(3))
    both = jnp.maximum(mid[:, :, : 2 * c], mid[:, :, 2 * c :])
    v0 = jnp.maximum(up[:, :, 2 * c :], both)     # out row-quadrant a=0
    v1 = jnp.maximum(both, dn[:, :, : 2 * c])     # out row-quadrant a=1
    # Four quadrant parts dotted against their B row blocks directly —
    # Mosaic cannot lane-concat slices with mismatched intra-vreg offsets.
    q = 0
    for v in (v0, v1):  # v: [bh, bw+2, 64] = (b=0|b=1) column quadrants
        lf, md, rt = v[:, 0:bw], v[:, 1 : 1 + bw], v[:, 2 : 2 + bw]
        bothw = jnp.maximum(md[:, :, :c], md[:, :, c:])
        h0 = jnp.maximum(lf[:, :, c:], bothw)
        h1 = jnp.maximum(bothw, rt[:, :, :c])
        for part in (h0, h1):
            acc = acc + _dot(part.reshape(m, c), kb_ref[c * q : c * (q + 1), :])
            q += 1

    # Branches 3/4: second convs on the y halves (both plain packed 3-tap).
    acc34 = jnp.zeros((m, cin), jnp.float32)
    for u in range(3):
        for v in range(3):
            a3 = ys[u : u + bh, v : v + bw, 0:cin].reshape(m, cin)
            a4 = ys[u : u + bh, v : v + bw, cin : 2 * cin].reshape(m, cin)
            acc34 = acc34 + _dot(a3, k32_ref[u, v]) + _dot(a4, k42_ref[u, v])
    acc = acc + acc34 + bt_ref[0][None, :]
    o_ref[...] = jnp.maximum(acc, 0.0).astype(o_ref.dtype).reshape(bh, bw, 128)


def fam_conv_supported(x_shape) -> bool:
    _, h, w, c = x_shape
    if c != 128:
        return False
    bh, bw = _pick_tiles(h, w, bw_max=CHAIN_BW_MAX)
    return bh is not None and bw is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def fam_conv_fused(x, ka, kb, k1, b1, k32, k42, bias_total, interpret: bool = False):
    """The FAM's whole conv stage in one kernel: returns the post-fusion ReLU
    tensor (pre-attention). See `_fam_conv_kernel`; weights pre-folded by the
    caller (models/packed_inference._fam_packed). x: [B,H,W,128] >= 0.
    """
    b, h, w, cin = x.shape
    bh, bw = _pick_tiles(h, w, bw_max=CHAIN_BW_MAX)
    sw = _round8(bw + 4)
    wp = (w // bw - 1) * bw + sw
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, wp - w - 2), (0, 0)))

    def f32b(v, n):
        return jnp.asarray(v, jnp.float32).reshape(1, n)

    return pl.pallas_call(
        functools.partial(_fam_conv_kernel, bh, bw, h, w),
        grid=(b, h // bh, w // bw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(
            (None, bh, bw, 128), lambda ib, ih, iw: (ib, ih, iw, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 128), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 4, sw, cin), x.dtype),
            pltpu.VMEM((bh + 2, sw, 256), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * (9 * cin * 512 + 2 * cin * cin),
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xp,
        jnp.asarray(ka, x.dtype), jnp.asarray(kb, x.dtype),
        k1.astype(x.dtype), f32b(b1, 256),
        k32.astype(x.dtype), k42.astype(x.dtype), f32b(bias_total, 128),
    )


def _tail_apply_g1_kernel(x_ref, ca_ref, sa_ref, w_ref, o_ref):
    """out tile = ((x * ca * sa_broadcast) @ W) — the FAM tail apply with a
    following 1x1 (e.g. the per-branch fusion slice) folded in, so the big
    tensor flows custom-call-to-custom-call around the tiny XLA attention
    ops. W: [128, Cout] f32."""
    x = x_ref[...] * ca_ref[0][None, None, :].astype(x_ref.dtype)
    sa = sa_ref[...].astype(x.dtype)  # [bh, W, 4]
    rep = jnp.concatenate(
        [jnp.broadcast_to(sa[:, :, q : q + 1], (*x.shape[:2], 32)) for q in range(4)],
        axis=-1,
    )
    m = x.shape[0] * x.shape[1]
    acc = _dot((x * rep).reshape(m, x.shape[2]), w_ref[...])
    o_ref[...] = acc.astype(o_ref.dtype).reshape(*x.shape[:2], -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fam_tail_apply_g1(x, ca_vec, sa, w_g1, interpret: bool = False):
    """[B,H,W,128] x, [B,128] ca, [B,H,W,4] sa, [128,Cout] w -> x*ca*sa @ w."""
    b, h, w, _ = x.shape
    cout = w_g1.shape[-1]
    bh = _pick_rows(h, w)
    return pl.pallas_call(
        _tail_apply_g1_kernel,
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((None, bh, w, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bh, w, 4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bh, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(x, _ca8(ca_vec), sa, jnp.asarray(w_g1, jnp.float32))
