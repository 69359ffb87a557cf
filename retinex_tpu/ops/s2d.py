"""Space-to-depth (2x2) convolution transforms — exact rewrites of
narrow-channel convolutions into MXU-efficient wide-channel ones.

Motivation (BENCH_NOTES.md): 3x3 convs at 32 channels run at ~3% MXU
utilization on TPU (5.6 TFLOP/s); the same math packed 2x2-to-channels
(32 -> 128 channels at half resolution) measures 2x faster wall-clock despite
4x nominal FLOPs. These helpers build the packed kernels EXACTLY — packed
outputs equal the original convolution's outputs up to float reassociation.

Layout: `s2d` packs pixel (2I+a, 2J+b), channel c into packed channel
(a*2 + b)*C + c at packed position (I, J). All transforms assume 'SAME' zero
padding and odd kernel sizes; H and W must be even (letterbox pads to /32).

The derivation for stride 1: out(2I+c, 2J+d) = sum_{u,v} k[u,v] x(2I+c+u, ...).
Writing c+u = 2P + a with a=(c+u)&1, P=(c+u)>>1 maps every original tap to a
packed tap (P, a); collecting terms gives a packed kernel over a
ceil((k+1)/2)-wide packed window. For stride 2, only output quadrant (0,0)
exists, so the packed conv emits Cout channels at packed resolution — which IS
the original stride-2 output, already unpacked.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] (quadrant-major channel blocks)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [b, h/2, w/2, a, b, c]
    return x.reshape(b, h // 2, w // 2, 4 * c)


def d2s(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d`. [B, h, w, 4C] -> [B, 2h, 2w, C]."""
    b, hh, ww, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, hh, ww, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * hh, 2 * ww, c)


def _packed_tap_range(k: int) -> tuple[int, int]:
    """Packed window [P_min, P_max] for an odd kxk stride-1 kernel."""
    r = k // 2
    # c + u for c in {0,1}, u in [-r, r]  ->  [-r, r+1]; P = floor((c+u)/2).
    p_min = int(np.floor(-r / 2))
    p_max = int(np.floor((r + 1) / 2))
    return p_min, p_max


def pack_kernel_s1(kernel: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Pack an odd kxk stride-1 HWIO kernel [k,k,Cin,Cout] (torch-parity
    padding r*dilation) into the packed HWIO kernel [kp,kp,4Cin,4Cout]."""
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    r = k // 2
    rd = r * dilation
    p_min = int(np.floor(-rd / 2))
    p_max = int(np.floor((rd + 1) / 2))
    kp = p_max - p_min + 1
    out = np.zeros((kp, kp, 4 * cin, 4 * cout), dtype=np.float32)
    kern = np.asarray(kernel, dtype=np.float32)
    for c_q in range(2):
        for d_q in range(2):
            for u in range(-r, r + 1):
                for v in range(-r, r + 1):
                    ue, ve = u * dilation, v * dilation
                    a = (c_q + ue) & 1
                    p = (c_q + ue) >> 1
                    b_ = (d_q + ve) & 1
                    q = (d_q + ve) >> 1
                    out[
                        p - p_min,
                        q - p_min,
                        (a * 2 + b_) * cin : (a * 2 + b_ + 1) * cin,
                        (c_q * 2 + d_q) * cout : (c_q * 2 + d_q + 1) * cout,
                    ] += kern[u + r, v + r]
    # The += above would double-count if two (u) mapped to the same (P,a) for
    # one c_q — impossible since u -> (P,a) is injective for fixed c_q.
    return jnp.asarray(out)


def pack_kernel_s2(kernel: jnp.ndarray) -> jnp.ndarray:
    """Pack an odd kxk stride-2 HWIO kernel into a packed stride-1 kernel
    [kp,kp,4Cin,Cout] whose output IS the original stride-2 output."""
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    r = k // 2
    p_min = int(np.floor(-r / 2))
    p_max = int(np.floor(r / 2))
    kp = p_max - p_min + 1
    out = np.zeros((kp, kp, 4 * cin, cout), dtype=np.float32)
    kern = np.asarray(kernel, dtype=np.float32)
    for u in range(-r, r + 1):
        for v in range(-r, r + 1):
            a = u & 1
            p = u >> 1
            b_ = v & 1
            q = v >> 1
            out[p - p_min, q - p_min, (a * 2 + b_) * cin : (a * 2 + b_ + 1) * cin, :] += kern[
                u + r, v + r
            ]
    return jnp.asarray(out)


def pack_pointwise(kernel: jnp.ndarray) -> jnp.ndarray:
    """Pack a 1x1 HWIO kernel [1,1,Cin,Cout] -> [1,1,4Cin,4Cout]
    (block diagonal over quadrants)."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    out = np.zeros((1, 1, 4 * cin, 4 * cout), dtype=np.float32)
    kern = np.asarray(kernel, dtype=np.float32)[0, 0]
    for q in range(4):
        out[0, 0, q * cin : (q + 1) * cin, q * cout : (q + 1) * cout] = kern
    return jnp.asarray(out)


def _pack_s1_map(k: int, dilation: int) -> np.ndarray:
    """Constant placement tensor M[kp,kp,xq,yq,u,v] (0/1) such that
    packed[p,q, xq*Cin+i, yq*Cout+o] = sum_{u,v} M[p,q,xq,yq,u,v] k[u,v,i,o]
    reproduces :func:`pack_kernel_s1`."""
    r = k // 2
    rd = r * dilation
    p_min = int(np.floor(-rd / 2))
    p_max = int(np.floor((rd + 1) / 2))
    kp = p_max - p_min + 1
    m = np.zeros((kp, kp, 4, 4, k, k), np.float32)
    for c_q in range(2):
        for d_q in range(2):
            for u in range(-r, r + 1):
                for v in range(-r, r + 1):
                    ue, ve = u * dilation, v * dilation
                    a = (c_q + ue) & 1
                    p = (c_q + ue) >> 1
                    b_ = (d_q + ve) & 1
                    q = (d_q + ve) >> 1
                    m[p - p_min, q - p_min, a * 2 + b_, c_q * 2 + d_q, u + r, v + r] += 1.0
    return m


def _pack_s2_map(k: int) -> np.ndarray:
    """Placement tensor M[kp,kp,xq,u,v] reproducing :func:`pack_kernel_s2`."""
    r = k // 2
    p_min = int(np.floor(-r / 2))
    p_max = int(np.floor(r / 2))
    kp = p_max - p_min + 1
    m = np.zeros((kp, kp, 4, k, k), np.float32)
    for u in range(-r, r + 1):
        for v in range(-r, r + 1):
            m[(u >> 1) - p_min, (v >> 1) - p_min, (u & 1) * 2 + (v & 1), u + r, v + r] += 1.0
    return m


def pack_kernel_s1_t(kernel: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Traceable/differentiable :func:`pack_kernel_s1` (einsum against a
    constant 0/1 placement tensor — a pure permutation). Used by the packed
    TRAIN path, where the packing sits inside the jitted step so gradients
    flow back to the original Flax parameters.

    precision=HIGHEST on every packing einsum: the selection tensor is exact
    in bf16, but the WEIGHT operand is not — at TPU default matmul precision
    the MXU would truncate the f32 weights to bf16 inside the f32 train step
    (same hazard class as the border-cell 257 in clahe_gather). HIGHEST keeps
    the permutation bit-exact; the contractions are tiny (one [k,k,C,C']
    kernel per conv per step)."""
    k, _, cin, cout = kernel.shape
    m = jnp.asarray(_pack_s1_map(k, int(dilation)))
    out = jnp.einsum(
        "pqxyuv,uvio->pqxiyo", m, kernel.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(m.shape[0], m.shape[1], 4 * cin, 4 * cout)


def pack_kernel_s2_t(kernel: jnp.ndarray) -> jnp.ndarray:
    """Traceable/differentiable :func:`pack_kernel_s2`."""
    k, _, cin, cout = kernel.shape
    m = jnp.asarray(_pack_s2_map(k))
    out = jnp.einsum(
        "pqxuv,uvio->pqxio", m, kernel.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(m.shape[0], m.shape[1], 4 * cin, cout)


def pack_pointwise_t(kernel: jnp.ndarray) -> jnp.ndarray:
    """Traceable/differentiable :func:`pack_pointwise`."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    out = jnp.einsum(
        "xy,io->xiyo", jnp.eye(4, dtype=jnp.float32), kernel[0, 0].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(1, 1, 4 * cin, 4 * cout)


def pack_convtranspose2_t(kernel: jnp.ndarray) -> jnp.ndarray:
    """Traceable/differentiable quadrant packing of a flax ConvTranspose
    k2s2 kernel [2,2,Cin,Cout] -> pointwise [1,1,Cin,4Cout] (the flipped-
    quadrant rule of models/packed_inference._pack_convtranspose2)."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    f = np.zeros((4, 2, 2), np.float32)
    for c in range(2):
        for d in range(2):
            f[c * 2 + d, 1 - c, 1 - d] = 1.0
    out = jnp.einsum(
        "yuv,uvio->iyo", jnp.asarray(f), kernel.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(1, 1, cin, 4 * cout)


def conv_im2col(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
    relu: bool = False,
) -> jnp.ndarray:
    """Narrow-Cin convolution as explicit patches + one wide GEMM.

    XLA's conv emitter runs Cin<=16 convolutions (the packed 12-channel input
    convs) at ~7 TF/s; materializing the kh*kw*Cin patch tensor and hitting the
    MXU with a single K=kh*kw*Cin GEMM measures ~4x faster despite the extra
    HBM round trip. Torch-parity 'SAME' padding (pad low-heavy), stride 1.
    """
    kh, kw, cin, cout = kernel.shape
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, u : u + h, v : v + w, :] for u in range(kh) for v in range(kw)], axis=-1
    )
    out = jnp.einsum(
        "bhwk,ko->bhwo",
        patches,
        kernel.reshape(kh * kw * cin, cout).astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        reps = cout // bias.shape[0]
        out = out + jnp.tile(bias, reps).astype(out.dtype)
    out = out.astype(x.dtype)
    return jax.nn.relu(out) if relu else out


def conv_s2d(
    x_packed: jnp.ndarray, packed_kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
    quadrant_bias: bool = True,
) -> jnp.ndarray:
    """Run the packed convolution (zero padding equivalent to the original
    'SAME', stride 1 on the packed grid). bias: original [Cout] bias, tiled
    per quadrant when the packed kernel emits 4*Cout channels.

    The packed tap range is [-kp//2, ...] for both the stride-1 (odd kp) and
    stride-2 (even kp) packings, so pad low-heavy: (kp//2, kp-1-kp//2).
    """
    kp = packed_kernel.shape[0]
    pad = (kp // 2, kp - 1 - kp // 2)
    out = lax.conv_general_dilated(
        x_packed,
        packed_kernel.astype(x_packed.dtype),
        window_strides=(1, 1),
        padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        reps = out.shape[-1] // bias.shape[0]
        out = out + jnp.tile(bias, reps).astype(out.dtype)
    return out


def _nbr(g: jnp.ndarray, axis: int):
    """(g[i-1], g[i+1]) along `axis` with edge clamping."""
    def sl(a, b):
        return tuple(slice(a, b) if k == axis else slice(None) for k in range(g.ndim))

    gm = jnp.concatenate([g[sl(0, 1)], g[sl(0, -1)]], axis=axis)
    gp = jnp.concatenate([g[sl(1, None)], g[sl(-1, None)]], axis=axis)
    return gm, gp


def _up_phases(g: jnp.ndarray, axis: int, n: int) -> list[jnp.ndarray]:
    """The n phase tensors of a half-pixel bilinear n-x upsample along `axis`:
    out[n*K + p] = phases[p][K]. Weights from src = (p+0.5)/n - 0.5, edges
    clamped — cv2 INTER_LINEAR / jax.image.resize('linear') semantics."""
    gm, gp = _nbr(g, axis)
    outs = []
    for p in range(n):
        f = (p + 0.5) / n - 0.5
        if f < 0:
            outs.append((-f) * gm + (1.0 + f) * g)
        else:
            outs.append((1.0 - f) * g + f * gp)
    return outs


def _interleave_axis(ts: list[jnp.ndarray], axis: int) -> jnp.ndarray:
    st = jnp.stack(ts, axis=axis + 1)
    shape = list(ts[0].shape)
    shape[axis] *= len(ts)
    return st.reshape(shape)


def s2d_upsample(g: jnp.ndarray, factor: int) -> jnp.ndarray:
    """s2d(resize_bilinear(g, factor*H, factor*W)) without the full-resolution
    gather resize: phase-decomposed shift-lerps + row/col interleaves.

    The net path upsamples the scale-2/3 tower features 4x/16x back to full
    resolution (reference: models/model.py:421-431 F.interpolate) and the
    gather-based resize + s2d measured 13.5 ms/batch(2) at 1080p; the phase
    form is pure streaming VPU work. factor must be even (packed output).
    g: [B, h, w, C] -> [B, factor*h/2, factor*w/2, 4C] (quadrant-major).
    """
    assert factor % 2 == 0 and factor >= 2
    half = factor // 2
    rph = _up_phases(g, 1, factor)
    rows = [_interleave_axis([rph[2 * i + a] for i in range(half)], 1) for a in (0, 1)]
    quads = []
    for a in (0, 1):
        cph = _up_phases(rows[a], 2, factor)
        for bq in (0, 1):
            quads.append(_interleave_axis([cph[2 * j + bq] for j in range(half)], 2))
    return jnp.concatenate(quads, axis=-1)


def maxpool3x3_s1_s2d(x_packed: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 max pool ('SAME', -inf padding) in packed space.

    Separable: a 3-tap max along rows then along columns (max is associative,
    so this is exact) — 4 passes over the tensor instead of the 9x4-quadrant
    tap enumeration (36 slices) of the direct form.

    Row pass, output row-quadrant c at packed row I covers original rows
    2I+c-1 .. 2I+c+1: c=0 -> {(I-1,a=1), (I,a=0), (I,a=1)},
    c=1 -> {(I,a=0), (I,a=1), (I+1,a=0)}. Column pass is symmetric in d.
    """
    b, hh, ww, c4 = x_packed.shape
    c = c4 // 4
    neg = float("-inf")
    q = x_packed.reshape(b, hh, ww, 2, 2, c)

    qp = jnp.pad(q, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)), constant_values=neg)
    mid = qp[:, 1 : 1 + hh]
    both = jnp.maximum(mid[:, :, :, 0], mid[:, :, :, 1])  # max over a at row I
    v0 = jnp.maximum(qp[:, 0:hh, :, 1], both)
    v1 = jnp.maximum(both, qp[:, 2 : 2 + hh, :, 0])
    v = jnp.stack([v0, v1], axis=3)  # [b, hh, ww, c_q, d_q, c]

    vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0), (0, 0)), constant_values=neg)
    midw = vp[:, :, 1 : 1 + ww]
    bothw = jnp.maximum(midw[:, :, :, :, 0], midw[:, :, :, :, 1])
    h0 = jnp.maximum(vp[:, :, 0:ww, :, 1], bothw)
    h1 = jnp.maximum(bothw, vp[:, :, 2 : 2 + ww, :, 0])
    return jnp.stack([h0, h1], axis=4).reshape(b, hh, ww, c4)


def _phase_matrix(n_out: int, n_in: int, factor: int, quadrant: int) -> jnp.ndarray:
    """[n_out, n_in] bilinear interpolation rows for packed output index I of
    row-quadrant `quadrant`: src = (2I + q + 0.5)/factor - 0.5, edge-clamped
    (cv2 INTER_LINEAR / jax.image 'linear' half-pixel semantics)."""
    rows = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        src = (2 * i + quadrant + 0.5) / factor - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), n_in - 1)
        hi_c = min(max(lo + 1, 0), n_in - 1)
        rows[i, lo_c] += 1.0 - frac
        rows[i, hi_c] += frac
    return jnp.asarray(rows)


def s2d_upsample_mxu(g: jnp.ndarray, factor: int, mode: int = 0) -> jnp.ndarray:
    """`s2d_upsample` as four separable matrix products on the MXU.

    The phase-interleave form materializes 32-lane-minor intermediates that
    pad 4x in TPU layouts (measured 4.7 + 3.5 ms/batch for the x4/x16 net
    fusion upsamples vs ~0.6 ms of roofline); expressing the bilinear
    upsample as out_q(a,b) = A_y^(a) @ g @ A_x^(b)^T with STATIC per-quadrant
    interpolation matrices turns it into dense matmul work XLA schedules
    well. Same math up to f32-accumulation rounding.
    g: [B, h, w, C] -> [B, factor*h/2, factor*w/2, 4C] (quadrant-major).

    mode selects the einsum/transpose formulation (exact same values; the
    b24 OOM dump shows mode 0's transpose+reshape paying TWO full relayout
    copies of the ~3 GB output — modes 1/2 order the einsum output so the
    channel merge (a, d, c) -> 4C is a free reshape):
    0: abpjc / abdpqc + transpose(1,3,4,0,2,5)  (round-2 form)
    1: bpajc / bpqadc + free reshape
    2: one 3-operand einsum api,dqj,bijc->bpqadc + free reshape
    """
    assert factor % 2 == 0 and factor >= 2
    b, h, w, c = g.shape
    hp, wp = factor * h // 2, factor * w // 2
    ay = jnp.stack([_phase_matrix(hp, h, factor, q) for q in (0, 1)])  # [2,hp,h]
    ax = jnp.stack([_phase_matrix(wp, w, factor, q) for q in (0, 1)])  # [2,wp,w]
    dt = g.dtype
    if mode == 1:
        t = jnp.einsum("api,bijc->bpajc", ay.astype(dt), g,
                       preferred_element_type=jnp.float32).astype(dt)
        o = jnp.einsum("dqj,bpajc->bpqadc", ax.astype(dt), t,
                       preferred_element_type=jnp.float32).astype(dt)
        return o.reshape(b, hp, wp, 4 * c)
    if mode == 2:
        o = jnp.einsum("api,dqj,bijc->bpqadc", ay.astype(dt), ax.astype(dt), g,
                       preferred_element_type=jnp.float32).astype(dt)
        return o.reshape(b, hp, wp, 4 * c)
    # rows: [2(a), B, hp, w, C]; cols then quadrant-major channel concat.
    t = jnp.einsum("api,bijc->abpjc", ay.astype(dt), g,
                   preferred_element_type=jnp.float32).astype(dt)
    o = jnp.einsum("dqj,abpjc->abdpqc", ax.astype(dt), t,
                   preferred_element_type=jnp.float32).astype(dt)
    # [2a, B, 2d, hp, wp, c] -> [B, hp, wp, (a*2+d)*c]
    o = o.transpose(1, 3, 4, 0, 2, 5).reshape(b, hp, wp, 4 * c)
    return o
