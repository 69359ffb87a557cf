"""Pallas implicit-GEMM 2D convolution for wide-channel NHWC tensors.

XLA's conv emitter runs the space-to-depth-packed 3x3/128ch convolutions of
the net path at ~20% MXU utilization (BENCH_NOTES.md). This kernel lowers the
convolution as kh*kw shifted [rows, Cin] @ [Cin, Cout] MXU dots accumulated in
f32 VMEM — the classic implicit-GEMM schedule — with the input row band
(+halo) DMA'd from HBM per program.

Scope (falls back to XLA outside it, see `conv_pallas_supported`):
- stride 1, rhs_dilation 1 (the packed kernels from ops/s2d.py fold stride/
  dilation into the packed taps already)
- Cin/Cout multiples of 128 (use it on packed tensors)
- torch-parity asymmetric padding (pad_low = k//2, pad_high = k-1-k//2 per
  spatial dim), matching ops/s2d.conv_s2d for both odd (kp=3) and even (kp=2)
  packed kernels.

Exact up to float reassociation: accumulation is f32 per tap on bf16/f32
operands, like XLA's conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _divisors_under(n: int, target: int) -> int:
    """Largest divisor of n <= target, preferring multiples of 8 (sublanes)."""
    cands = [d for d in range(1, min(n, target) + 1) if n % d == 0]
    aligned = [d for d in cands if d % 8 == 0]
    return max(aligned) if aligned else max(cands)


def conv_pallas_supported(x_shape, kernel_shape) -> bool:
    _, h, w, cin = x_shape
    kh, kw, kcin, cout = kernel_shape
    if kcin != cin or cin % 128 or cout % 128:
        return False
    if kh > 3 or kw > 3:
        return False
    if kh == 1 and kw == 1:
        # 1x1 convs are pure matmuls: XLA runs them at high MXU efficiency
        # AND fuses surrounding elementwise ops; a pallas_call only adds
        # pad/DMA overhead and breaks fusion (measured net-negative).
        return False
    # need decent 8-aligned block divisors (HBM DMA tiling constraint)
    return h >= 8 and w >= 128 and _divisors_under(w, 512) % 8 == 0


def _conv_kernel(bh, bw, kh, kw, relu, x_ref, k_ref, b_ref, o_ref, xs, sem):
    """One program: output tile [bh, bw, Cout] of image `ib`.

    x_ref: [B, Hp, Wp, Cin] in HBM (pre-padded); k_ref: [kh, kw, Cin, Cout]
    VMEM; b_ref: [1, Cout] f32 VMEM; o_ref: [bh, bw, Cout] VMEM block;
    xs: VMEM scratch [bh+kh-1, bw+kw-1, Cin]; sem: DMA semaphore.
    """
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iw = pl.program_id(2)
    cin = xs.shape[-1]
    cout = o_ref.shape[-1]

    sw = xs.shape[1]  # bw+kw-1 rounded up to the 8-sublane tiling
    copy = pltpu.make_async_copy(
        x_ref.at[ib, pl.ds(ih * bh, bh + kh - 1), pl.ds(iw * bw, sw), :],
        xs,
        sem,
    )
    copy.start()
    copy.wait()

    acc = jnp.zeros((bh * bw, cout), jnp.float32)
    for u in range(kh):
        for v in range(kw):
            a = xs[u : u + bh, v : v + bw, :].reshape(bh * bw, cin)
            acc = acc + jax.lax.dot_general(
                a,
                k_ref[u, v],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0][None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(bh, bw, cout)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv2d_pallas(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    relu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Convolution with torch-parity 'SAME' padding (stride 1).

    x: [B, H, W, Cin]; kernel: [kh, kw, Cin, Cout] (HWIO); returns
    [B, H, W, Cout] in x.dtype. Drop-in for ops/s2d.conv_s2d's conv when
    `conv_pallas_supported`.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    pad_h = (kh // 2, kh - 1 - kh // 2)
    pad_w = (kw // 2, kw - 1 - kw // 2)

    bh = _divisors_under(h, 16)
    # VMEM budget: f32 accumulator (bh*bw*cout*4) + halo scratch + double-
    # buffered output block must stay well under the ~16 MB scoped limit.
    bw_target = max(64, (512 * 128 * 128) // (cin * cout))
    bw = _divisors_under(w, bw_target)
    # HBM DMA slices along the sublane (W) dim must be 8-aligned in offset and
    # size: bw is a multiple of 8 (or w is tiny), and the halo'd scratch width
    # rounds up to 8, with the source padded wide enough for the last tile.
    sw = -(-(bw + kw - 1) // 8) * 8
    wp = (w // bw - 1) * bw + sw
    xp = jnp.pad(x, ((0, 0), pad_h, (pad_w[0], wp - w - pad_w[0]), (0, 0)))

    bias_arr = jnp.zeros((1, cout), jnp.float32) if bias is None else bias.reshape(1, cout)
    flops = 2 * b * h * w * kh * kw * cin * cout
    out = pl.pallas_call(
        functools.partial(_conv_kernel, bh, bw, kh, kw, relu),
        grid=(b, h // bh, w // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, bh, bw, cout), lambda ib, ih, iw: (ib, ih, iw, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + kh - 1, sw, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, kernel.astype(x.dtype), bias_arr)
    return out


# ---------------------------------------------------------------------------
# Narrow-channel (Cin <= 64) implicit-im2col convolution.
#
# The packed (s2d) rewrite buys MXU width at 4x nominal FLOPs; for a 3x3/32ch
# conv XLA runs the packed form at ~71 TF/s = ~18 TF/s on the LOGICAL flops.
# Building the kh*kw*Cin patch rows IN VMEM and hitting the MXU with a single
# K=kh*kw*Cin GEMM costs the logical flops only: K=288 spans 2.25 MXU K-tiles
# (75% K utilization) so the ceiling is ~197*0.75*(Cout/128) TF/s — above the
# packed path for Cout >= 32 with no 4x overhead. (The XLA-level im2col in
# ops/s2d.conv_im2col materializes the patch tensor in HBM — 9x the bytes —
# and measured 44 ms for this op; in VMEM the patches never leave the core.)
# ---------------------------------------------------------------------------


def conv_narrow_supported(x_shape, kernel_shape, dilation: int = 1) -> bool:
    """Currently always False on real TPUs: Mosaic HBM DMA requires the minor
    (channel) dim tiled to 128, so sub-128-channel arrays cannot be manually
    DMA'd ("Slice shape along dimension 3 must be aligned to tiling (128)").
    The kernel is exact under the interpreter (tests); the production path
    achieves the same single-GEMM schedule on PACKED tensors instead
    (`conv2d_pallas_im2col`, K=kp*kp*128 — fully lane-aligned)."""
    _, h, w, cin = x_shape
    kh, kw, kcin, cout = kernel_shape
    if kcin != cin or cin > 64 or cin % 8 or cout % 32:
        return False
    if kh != kw or kh not in (3, 5) or dilation not in (1, 2):
        return False
    return h >= 8 and w >= 128 and _divisors_under(w, 512) % 8 == 0


def _conv_narrow_kernel(bh, bw, kh, kw, dil, relu, x_ref, k_ref, b_ref, o_ref,
                        xs, sem):
    """One program: output tile [bh, bw, Cout]; patches built in VMEM.

    x_ref: [B, Hp, Wp, Cin] HBM (pre-padded by (kh//2)*dil each side);
    k_ref: [kh*kw*Cin, Cout] VMEM (tap-major rows, matching the patch
    concatenation order); xs: VMEM [bh + (kh-1)*dil, sw, Cin].
    """
    ib, ih, iw = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cin = xs.shape[-1]
    cout = o_ref.shape[-1]

    copy = pltpu.make_async_copy(
        x_ref.at[ib, pl.ds(ih * bh, bh + (kh - 1) * dil), pl.ds(iw * bw, xs.shape[1]), :],
        xs, sem,
    )
    copy.start()
    copy.wait()

    patches = jnp.concatenate(
        [
            xs[u * dil : u * dil + bh, v * dil : v * dil + bw, :].reshape(bh * bw, cin)
            for u in range(kh)
            for v in range(kw)
        ],
        axis=-1,
    )
    acc = jax.lax.dot_general(
        patches, k_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + b_ref[0][None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(bh, bw, cout)


@functools.partial(jax.jit, static_argnames=("relu", "dilation", "interpret"))
def conv2d_narrow(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    relu: bool = False,
    dilation: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Narrow-Cin conv, torch-parity 'SAME' (pad (k//2)*dilation), stride 1.

    x: [B, H, W, Cin<=64]; kernel: [kh, kw, Cin, Cout]; f32 accumulation.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    r = (kh // 2) * dilation

    bh = _divisors_under(h, 16)
    # patches [bh*bw, kh*kw*cin] bf16 + f32 acc dominate VMEM; keep ~6 MB.
    bw_target = max(128, 3_000_000 // (bh * kh * kw * cin * 2))
    bw = _divisors_under(w, bw_target)
    sw = -(-(bw + (kw - 1) * dilation) // 8) * 8
    wp = (w // bw - 1) * bw + sw
    xp = jnp.pad(x, ((0, 0), (r, r), (r, wp - w - r), (0, 0)))

    k2d = kernel.reshape(kh * kw * cin, cout)
    bias_arr = jnp.zeros((1, cout), jnp.float32) if bias is None else bias.reshape(1, cout)
    out = pl.pallas_call(
        functools.partial(_conv_narrow_kernel, bh, bw, kh, kw, dilation, relu),
        grid=(b, h // bh, w // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, bh, bw, cout), lambda ib, ih, iw: (ib, ih, iw, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + (kh - 1) * dilation, sw, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * kh * kw * cin * cout,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, k2d.astype(x.dtype), bias_arr)
    return out


def _conv_im2col_kernel(bh, bw, kh, kw, relu, x_ref, k_ref, b_ref, o_ref, xs, sem):
    """Like `_conv_kernel` but one K=kh*kw*Cin GEMM over VMEM-built patches.

    The per-tap schedule issues kh*kw dots of K=Cin each (weight reload per
    tap); concatenating the shifted slices on lanes (all 128-aligned for
    packed tensors) feeds the MXU one long-K contraction instead.
    k_ref: [kh*kw*Cin, Cout] (tap-major rows).
    """
    ib, ih, iw = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cin = xs.shape[-1]
    cout = o_ref.shape[-1]

    copy = pltpu.make_async_copy(
        x_ref.at[ib, pl.ds(ih * bh, bh + kh - 1), pl.ds(iw * bw, xs.shape[1]), :],
        xs, sem,
    )
    copy.start()
    copy.wait()

    patches = jnp.concatenate(
        [
            xs[u : u + bh, v : v + bw, :].reshape(bh * bw, cin)
            for u in range(kh)
            for v in range(kw)
        ],
        axis=-1,
    )
    acc = jax.lax.dot_general(
        patches, k_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + b_ref[0][None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(bh, bw, cout)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv2d_pallas_im2col(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    relu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """`conv2d_pallas` with the single-GEMM im2col schedule (same scope)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    pad_h = (kh // 2, kh - 1 - kh // 2)
    pad_w = (kw // 2, kw - 1 - kw // 2)

    bh = _divisors_under(h, 16)
    # patches [bh*bw, kh*kw*cin] bf16 dominates VMEM; keep it ~4 MB.
    bw_target = max(64, 2_000_000 // (bh * kh * kw * cin * 2))
    bw = _divisors_under(w, bw_target)
    sw = -(-(bw + kw - 1) // 8) * 8
    wp = (w // bw - 1) * bw + sw
    xp = jnp.pad(x, ((0, 0), pad_h, (pad_w[0], wp - w - pad_w[0]), (0, 0)))

    k2d = kernel.reshape(kh * kw * cin, cout)
    bias_arr = jnp.zeros((1, cout), jnp.float32) if bias is None else bias.reshape(1, cout)
    out = pl.pallas_call(
        functools.partial(_conv_im2col_kernel, bh, bw, kh, kw, relu),
        grid=(b, h // bh, w // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, bh, bw, cout), lambda ib, ih, iw: (ib, ih, iw, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + kh - 1, sw, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * kh * kw * cin * cout,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, k2d.astype(x.dtype), bias_arr)
    return out
