"""Space-to-depth packed inference for MultiScaleUPRetinex.

Narrow-channel (32ch) full-resolution convolutions run at ~3% MXU utilization
(BENCH_NOTES.md); packing 2x2 pixels into channels makes them 128-wide and ~2x
faster wall-clock. This module evaluates the SAME trained parameters with the
full-resolution stages — IENet input conv, enc1, dec1, residual head, the
scale-1 tower with its FAM, fusion and output head — rewritten in packed space
(exact up to float reassociation; verified vs model.apply in
tests/test_packed_inference.py). The /2 stages (enc2, dec2: 64-channel convs
at H/2 x W/2) are packed the same way to 256-wide convs at /4; the /4-and-
below body (enc3..dec3, ASPP) and the scale-3 tower run through the regular
Flax modules. Every Pallas-kernel-vs-XLA choice is set by full-graph A/B
sweeps (scripts/perf_lab.py netcfg; see BENCH_NOTES.md round 2).

Usage:
    packed = PackedRetinex(model, variables)
    enhanced, reflectance, illu = jax.jit(packed)(x)   # NHWC float [0,1]

Requires H, W divisible by 2 (letterbox guarantees /32).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from retinex_tpu.ops.fused_blocks import (
    dec1_chain,
    dec1_chain_supported,
    fam_conv_fused,
    fam_conv_supported,
    fam_tail_apply,
    fam_tail_apply_g1,
    fam_tail_stats,
    fam_tail_supported,
)
from retinex_tpu.ops.resize import resize_bilinear, resize_scale
from retinex_tpu.ops.s2d import (
    conv_s2d,
    d2s,
    maxpool3x3_s1_s2d,
    pack_kernel_s1,
    pack_kernel_s2,
    pack_pointwise,
    s2d,
    s2d_upsample_mxu,
)

_BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class NetCfg:
    """Kernel-choice configuration for PackedRetinex.

    Defaults are the measured-winning full-graph configuration (perf_lab
    `netcfg` sweeps, BENCH_NOTES.md round 2). perf_lab constructs variants
    programmatically for A/B; production code should not override these.
    The one environment override, RETINEX_NO_FUSED=1, disables every Pallas
    custom call (debug / Mosaic-regression safety valve); it is applied at
    PackedRetinex construction.

    Measured-LOSING branches from round 2 (per-conv Pallas conv2d, narrow-Cin
    im2col, fam_dual_conv3, standalone fused tail) were deleted from this
    module — the kernels remain in ops/ with their standalone perf_lab
    experiments and tests, but they no longer gate the production graph.
    """

    fam_conv_fused: bool = True   # whole FAM conv stage as one Pallas kernel
    fam_tail_fold: bool = True    # fused FAM attention tail + fusion-slice fold
    packed_scale2: bool = True    # scale-2 tower evaluated in packed space
    dec1_chain: bool = False      # fused dec1 UpBlock chain (loses in-graph)
    aspp_dots: bool = False       # ASPP dilated convs as shifted MXU dots
    # (fusion 1x1 distributed over branches — no 1280-ch concat). Wins
    # standalone (2.66 vs 3.18 ms) but LOSES full-graph (netcfg b2: 111.3
    # vs 104.1 ms — the 9-dot formulation breaks XLA's conv pipelining in
    # the inner stage). Default off.
    planar_sa: bool = True        # FAM spatial-attention conv in planar
    # [b,c,h,w] layout (channel-minor [*,8]/[*,4] tensors tile T(8,128) and
    # pad 16-32x in HBM — a 95 MB sa map allocates 3 GB at b24). Full-graph
    # A/B (netcfg/bigbatch, round 3): b2 104.2 vs 103.9 ms (noise), b4 179.4
    # vs 181.3, b8 240 vs 255, b16 470 vs ~490 — default ON.
    ups_mode: int = 1             # s2d_upsample_mxu einsum formulation
    # (0 transpose-form, 1/2 free-reshape output orders — see ops/s2d.py).
    # Full-graph A/B (netcfg, round 3): mode 1 wins at every batch —
    # b2 102.4 vs 104.1 ms, b8 233.4 vs 241.0, b16 456.4 vs 470.8; mode 2
    # neutral. Default 1.
    fam_fused_max_batch: int = 2  # batch bound for the fused FAM/tail custom
    # calls (win at b<=2, lose 17-51 ms at b8 — netcfg/netstages round 3);
    # perf_lab raises it to re-sweep
    fam_xla_folded: bool = True   # XLA FAM chain with the fused kernel's
    # weight algebra (merged dual first conv, fusion 1x1 folded into branch
    # tails, ~7% fewer FLOPs); applies when the fused custom call is gated
    # off (b > fam_fused_max_batch). Full-graph A/B (netcfg, round 3):
    # b8 226.4 vs 233.6 ms (35.3 vs 34.2 fps), b2 neutral (fused kernel
    # path takes precedence there anyway). Default ON.

    def resolve(self) -> "NetCfg":
        if os.environ.get("RETINEX_NO_FUSED"):
            return dataclasses.replace(
                self, fam_conv_fused=False, fam_tail_fold=False, dec1_chain=False
            )
        return self


def _pack_fam(fam):
    """Pre-pack an EnhancedFAM's weights for packed-space evaluation.

    Returns a dict: packed per-branch kernels/biases, the fusion 1x1 split
    into per-branch row blocks (fusion(cat4(b1..b4)) == sum_i b_i @ W_i,
    which skips the quadrant interleave relayout of the 4c-channel concat —
    the kernel rows carry the permute), the stacked branch3/branch4 first
    convs for ops/fused_blocks.fam_dual_conv3, and the raw ca params
    (ca_reduce / ca_expand run unpacked on the GAP vector).
    """
    k = {
        "branch1": pack_pointwise(fam["branch1"]["kernel"]),
        "branch2_conv": pack_pointwise(fam["branch2_conv"]["kernel"]),
        "branch3_conv1": pack_kernel_s1(fam["branch3_conv1"]["kernel"]),
        "branch3_conv2": pack_kernel_s1(fam["branch3_conv2"]["kernel"]),
        "branch4_conv1": pack_kernel_s1(fam["branch4_conv1"]["kernel"]),
        "branch4_conv2": pack_kernel_s1(fam["branch4_conv2"]["kernel"], dilation=2),
        "fusion": pack_pointwise(fam["fusion"]["kernel"]),
        "sa_conv": pack_kernel_s1(fam["sa_conv"]["kernel"]),
    }
    b = {name: fam[name]["bias"] for name in (
        "branch1", "branch2_conv", "branch3_conv1", "branch3_conv2",
        "branch4_conv1", "branch4_conv2", "fusion", "sa_conv",
    )}
    c = fam["fusion"]["kernel"].shape[-1]
    kfu = fam["fusion"]["kernel"]  # [1,1,4c,c], input rows (branch, c)
    parts = [pack_pointwise(kfu[:, :, c * i : c * (i + 1), :]) for i in range(4)]
    # Whole-conv-stage folding for ops/fused_blocks.fam_conv_fused: the
    # fusion 1x1 commutes into each branch (pointwise-after-conv == conv
    # with transformed Cout); constants collect into one bias.
    wf = [jnp.asarray(p[0, 0], jnp.float32) for p in parts]
    # precision=HIGHEST: these weight x weight folds run once at construction;
    # default TPU matmul precision would bf16-truncate both operands, adding
    # avoidable error on top of the bf16 conv compute (same hazard class as
    # the ops/s2d packing einsums).
    hp = jax.lax.Precision.HIGHEST
    mm = lambda a, w: jnp.matmul(a, w, precision=hp)  # noqa: E731
    ka = mm(jnp.asarray(pack_pointwise(fam["branch1"]["kernel"])[0, 0], jnp.float32), wf[0])
    kb = mm(
        jnp.asarray(pack_pointwise(fam["branch2_conv"]["kernel"])[0, 0], jnp.float32),
        wf[1],
    )
    k32f = jnp.einsum("uvio,op->uvip", k["branch3_conv2"], wf[2], precision=hp)
    k42f = jnp.einsum("uvio,op->uvip", k["branch4_conv2"], wf[3], precision=hp)
    bias_total = (
        _tile4(b["fusion"])
        + mm(_tile4(b["branch1"]), wf[0])
        + mm(_tile4(b["branch2_conv"]), wf[1])
        + mm(_tile4(b["branch3_conv2"]), wf[2])
        + mm(_tile4(b["branch4_conv2"]), wf[3])
    )
    return {
        "k": k,
        "b": b,
        "parts": parts,
        "dual_k1": jnp.concatenate([k["branch3_conv1"], k["branch4_conv1"]], axis=-1),
        "dual_b1": jnp.concatenate(
            [_tile4(b["branch3_conv1"]), _tile4(b["branch4_conv1"])]
        ),
        "ka": ka,
        "kb": kb,
        "k32f": k32f,
        "k42f": k42f,
        "bias_total": bias_total,
        "ca": fam,
    }


def _pack_convtranspose2(kernel):
    """flax ConvTranspose k2s2: out(2I+c,2J+d) = sum_i K[1-c,1-d,i,o] x[I,J,i]
    (verified numerically) -> packed pointwise with flipped quadrants:
    [2,2,Cin,Cout] -> [1,1,Cin,4*Cout]."""
    kup = np.asarray(kernel, np.float32)
    cin, cout = kup.shape[2], kup.shape[3]
    kup_p = np.zeros((1, 1, cin, 4 * cout), np.float32)
    for c in range(2):
        for d in range(2):
            kup_p[0, 0, :, (c * 2 + d) * cout : (c * 2 + d + 1) * cout] = kup[1 - c, 1 - d]
    return jnp.asarray(kup_p)


def _conv_auto(x, packed_kernel, bias=None, relu=False):
    """Packed conv through XLA's conv emitter. Per-conv Pallas routing
    (conv2d_pallas, narrow-Cin im2col) was removed: both measured-losing in
    the full graph (BENCH_NOTES.md round 2; the kernels live on in ops/ and
    scripts/perf_lab.py standalone experiments)."""
    out = conv_s2d(x, packed_kernel, bias=bias)
    return jax.nn.relu(out) if relu else out


def _bn_affine(p, s):
    """Inference BatchNorm as per-channel (scale', bias')."""
    scale = p["scale"] / jnp.sqrt(s["var"] + _BN_EPS)
    return scale, p["bias"] - s["mean"] * scale


def _tile4(v):
    return jnp.tile(v, 4)


def _affine(y, scale, bias, tile=False):
    """y * scale + bias computed in y's dtype (keeps bf16 graphs bf16)."""
    if tile:
        scale, bias = _tile4(scale), _tile4(bias)
    return y * scale.astype(y.dtype) + bias.astype(y.dtype)


def _conv(x, kernel, bias=None, stride=1, dilation=1):
    """Plain torch-parity conv (explicit pad r*dilation)."""
    k = kernel.shape[0]
    pad = (k // 2) * dilation
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        (stride, stride),
        ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out if bias is None else out + bias.astype(out.dtype)


class PackedRetinex:
    """Callable packed-inference wrapper around trained variables."""

    def __init__(self, model, variables, cfg: NetCfg | None = None):
        self.cfg = (cfg or NetCfg()).resolve()
        self.model = model
        self.variables = variables
        self.use_preact = model.use_preact
        p = variables["params"]
        self.p = p
        self.s = variables.get("batch_stats", {})

        ie = p["ie_net"]
        # Pre-pack all full-resolution kernels once (host-side, tiny).
        self.k_input = pack_kernel_s1(ie["input_layer"]["kernel"])
        self.b_input = ie["input_layer"]["bias"]

        enc1 = ie["enc1"]
        self.k_enc1_conv1 = pack_kernel_s2(enc1["conv1"]["kernel"])
        self.k_enc1_short = pack_kernel_s2(enc1["shortcut_conv"]["kernel"])

        dec1 = ie["dec1"]
        self.k_dec1_up = _pack_convtranspose2(dec1["up"]["kernel"])
        self.b_dec1_up = dec1["up"]["bias"]
        self.k_dec1_c1 = pack_kernel_s1(dec1["conv1"]["Conv_0"]["kernel"])
        self.b_dec1_c1 = dec1["conv1"]["Conv_0"]["bias"]
        self.k_dec1_c2 = pack_kernel_s1(dec1["conv2"]["Conv_0"]["kernel"])
        self.b_dec1_c2 = dec1["conv2"]["Conv_0"]["bias"]

        self.k_rescv = pack_kernel_s1(ie["residual_conv"]["kernel"])
        self.b_rescv = ie["residual_conv"]["bias"]

        # The /2 stages (enc2, dec2: 64-channel convs at H/2 x W/2) packed the
        # same way: s2d(x2) -> 256-wide convs at /4.
        enc2 = ie["enc2"]
        self.k_enc2_conv1 = pack_kernel_s2(enc2["conv1"]["kernel"])
        self.k_enc2_short = pack_kernel_s2(enc2["shortcut_conv"]["kernel"])
        dec2 = ie["dec2"]
        self.k_dec2_up = _pack_convtranspose2(dec2["up"]["kernel"])
        self.b_dec2_up = dec2["up"]["bias"]
        self.k_dec2_c1 = pack_kernel_s1(dec2["conv1"]["Conv_0"]["kernel"])
        self.b_dec2_c1 = dec2["conv1"]["Conv_0"]["bias"]
        self.k_dec2_c2 = pack_kernel_s1(dec2["conv2"]["Conv_0"]["kernel"])
        self.b_dec2_c2 = dec2["conv2"]["Conv_0"]["bias"]

        # dec1 chain with the BN affines folded into the packed conv weights
        # (conv -> *scale + bias == conv with scaled kernel and shifted bias),
        # consumed by the fused ops/fused_blocks.dec1_chain kernel.
        s_dec1 = self.s["ie_net"]["dec1"]
        sc1, bi1 = _bn_affine(dec1["conv1"]["BatchNorm_0"], s_dec1["conv1"]["BatchNorm_0"])
        sc2, bi2 = _bn_affine(dec1["conv2"]["BatchNorm_0"], s_dec1["conv2"]["BatchNorm_0"])
        self.dec1_k_c1f = self.k_dec1_c1 * _tile4(sc1)[None, None, None, :]
        self.dec1_b_c1f = _tile4(self.b_dec1_c1 * sc1 + bi1)
        self.dec1_k_c2f = self.k_dec1_c2 * _tile4(sc2)[None, None, None, :]
        self.dec1_b_c2f = _tile4(self.b_dec1_c2 * sc2 + bi2)
        self.k_resout = pack_pointwise(ie["residual_out"]["kernel"])
        self.b_resout = ie["residual_out"]["bias"]

        sc1 = p["scale1"]
        self.k_s1conv = pack_kernel_s1(sc1["conv"]["kernel"])
        self.b_s1conv = sc1["conv"]["bias"]
        self.fam1 = _pack_fam(sc1["fam"])
        # scale2's tower is the same narrow-conv shape at half resolution
        # (pool-2 -> 32ch conv + FAM); pack it the same way.
        sc2 = p["scale2"]
        self.k_s2conv = pack_kernel_s1(sc2["conv"]["kernel"])
        self.b_s2conv = sc2["conv"]["bias"]
        self.fam2 = _pack_fam(sc2["fam"])

        self.k_fusion = pack_pointwise(p["fusion"]["kernel"])
        self.b_fusion = p["fusion"]["bias"]
        # Fusion commuted with the upsamples: fusion(cat(f1, up(f2), up(f3)))
        # = W1@f1 + up(W2@f2) + up(W3@f3) (1x1 conv and bilinear resize are
        # both linear), so the scale-2/3 slices run at their low resolution
        # and only the 32-channel results are phase-upsampled (s2d_upsample).
        kf = p["fusion"]["kernel"]
        self.k_fusion_f1 = pack_pointwise(kf[:, :, 0:32, :])
        self.w_fusion_f2 = kf[:, :, 32:64, :]
        self.k_fusion_f2p = pack_pointwise(kf[:, :, 32:64, :])
        self.w_fusion_f3 = kf[:, :, 64:96, :]
        self.k_output = pack_pointwise(p["output_layer"]["kernel"])
        self.b_output = p["output_layer"]["bias"]

    # ---------- packed building blocks ----------

    def _enc1(self, x1p):
        """enc1 on packed full-res input -> unpacked [B,H/2,W/2,64]."""
        ie_p, ie_s = self.p["ie_net"]["enc1"], self.s["ie_net"]["enc1"]
        if self.use_preact:
            sc, bi = _bn_affine(ie_p["bn1"], ie_s["bn1"])
            pre = jax.nn.relu(_affine(x1p, sc, bi, tile=True))
            short = _conv_auto(pre, self.k_enc1_short)
            ssc, sbi = _bn_affine(ie_p["shortcut_bn"], ie_s["shortcut_bn"])
            short = _affine(short, ssc, sbi)
            y = _conv_auto(pre, self.k_enc1_conv1)
            sc2, bi2 = _bn_affine(ie_p["bn2"], ie_s["bn2"])
            y = jax.nn.relu(_affine(y, sc2, bi2))
            y = _conv(y, ie_p["conv2"]["kernel"])
            return y + short
        else:
            y = _conv_auto(x1p, self.k_enc1_conv1)
            sc1, bi1 = _bn_affine(ie_p["bn1"], ie_s["bn1"])
            y = jax.nn.relu(_affine(y, sc1, bi1))
            y = _conv(y, ie_p["conv2"]["kernel"])
            sc2, bi2 = _bn_affine(ie_p["bn2"], ie_s["bn2"])
            y = _affine(y, sc2, bi2)
            short = _conv_auto(x1p, self.k_enc1_short)
            ssc, sbi = _bn_affine(ie_p["shortcut_bn"], ie_s["shortcut_bn"])
            short = _affine(short, ssc, sbi)
            return jax.nn.relu(y + short)

    def _dec1(self, d2):
        """dec1 UpBlock from [B,H/2,W/2,64] -> packed full-res [*,128]."""
        ie_p, ie_s = self.p["ie_net"]["dec1"], self.s["ie_net"]["dec1"]
        y = _conv(d2, self.k_dec1_up, _tile4(self.b_dec1_up))
        for kp, bias, name in (
            (self.k_dec1_c1, self.b_dec1_c1, "conv1"),
            (self.k_dec1_c2, self.b_dec1_c2, "conv2"),
        ):
            y = _conv_auto(y, kp, bias=bias)
            sc, bi = _bn_affine(ie_p[name]["BatchNorm_0"], ie_s[name]["BatchNorm_0"])
            y = jax.nn.relu(_affine(y, sc, bi, tile=True))
        return y

    def _enc2(self, x2p):
        """enc2 on packed [B,H/4,W/4,256] input -> unpacked [B,H/4,W/4,128]."""
        ie_p, ie_s = self.p["ie_net"]["enc2"], self.s["ie_net"]["enc2"]
        if self.use_preact:
            sc, bi = _bn_affine(ie_p["bn1"], ie_s["bn1"])
            pre = jax.nn.relu(_affine(x2p, sc, bi, tile=True))
            short = _conv_auto(pre, self.k_enc2_short)
            ssc, sbi = _bn_affine(ie_p["shortcut_bn"], ie_s["shortcut_bn"])
            short = _affine(short, ssc, sbi)
            y = _conv_auto(pre, self.k_enc2_conv1)
            sc2, bi2 = _bn_affine(ie_p["bn2"], ie_s["bn2"])
            y = jax.nn.relu(_affine(y, sc2, bi2))
            y = _conv(y, ie_p["conv2"]["kernel"])
            return y + short
        else:
            y = _conv_auto(x2p, self.k_enc2_conv1)
            sc1, bi1 = _bn_affine(ie_p["bn1"], ie_s["bn1"])
            y = jax.nn.relu(_affine(y, sc1, bi1))
            y = _conv(y, ie_p["conv2"]["kernel"])
            sc2, bi2 = _bn_affine(ie_p["bn2"], ie_s["bn2"])
            y = _affine(y, sc2, bi2)
            short = _conv_auto(x2p, self.k_enc2_short)
            ssc, sbi = _bn_affine(ie_p["shortcut_bn"], ie_s["shortcut_bn"])
            short = _affine(short, ssc, sbi)
            return jax.nn.relu(y + short)

    def _dec2(self, d3):
        """dec2 UpBlock from [B,H/4,W/4,128] -> packed /2 output [*, 256]."""
        ie_p, ie_s = self.p["ie_net"]["dec2"], self.s["ie_net"]["dec2"]
        y = _conv(d3, self.k_dec2_up, _tile4(self.b_dec2_up))
        for kp, bias, name in (
            (self.k_dec2_c1, self.b_dec2_c1, "conv1"),
            (self.k_dec2_c2, self.b_dec2_c2, "conv2"),
        ):
            y = _conv_auto(y, kp, bias=bias)
            sc, bi = _bn_affine(ie_p[name]["BatchNorm_0"], ie_s[name]["BatchNorm_0"])
            y = jax.nn.relu(_affine(y, sc, bi, tile=True))
        return y

    @staticmethod
    def _sa_planar(avg_map, max_map, k_sa, b_sa):
        """The packed 7x7 SA conv in planar [b, c, h, w] layout.

        The channel-minor form round-trips [*,8] and [*,4] tensors through
        T(8,128)-tiled HBM (16x/32x padding; ~4 GB of padding traffic per b8
        batch, and the b24 OOM's single largest allocation). Planar keeps
        lanes = w (unpadded); the conv runs as kp*kp shifted [8->4] channel
        contractions fused over the planes. Exact up to reassociation."""
        b_, hh, ww, _ = avg_map.shape
        # [b, 8, h, w] with channel order matching stack([avg,max],-1).reshape:
        # (q0a, q0m, q1a, q1m, ...) — build by interleaved stack then transpose.
        sa_in = jnp.stack([avg_map, max_map], axis=-1).reshape(b_, hh, ww, 8)
        sp = sa_in.transpose(0, 3, 1, 2)  # [b, 8, h, w]
        kp = k_sa.shape[0]
        p_lo, p_hi = kp // 2, kp - 1 - kp // 2
        sp = jnp.pad(sp, ((0, 0), (0, 0), (p_lo, p_hi), (p_lo, p_hi)))
        acc = None
        for u in range(kp):
            for v in range(kp):
                sl = sp[:, :, u : u + hh, v : v + ww]
                t = jnp.einsum(
                    "bchw,co->bohw", sl, k_sa[u, v].astype(sl.dtype),
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        reps = 4 // b_sa.shape[0]
        acc = acc + jnp.tile(b_sa, reps).astype(jnp.float32)[None, :, None, None]
        return jax.nn.sigmoid(acc).transpose(0, 2, 3, 1).astype(avg_map.dtype)

    def _middle_packed(self, x2):
        """middle (enc2 -> inner -> dec2 + skip) with the /2 stages packed."""
        x2p = s2d(x2)
        x3 = self._enc2(x2p)
        if self.cfg.aspp_dots and self.model.use_aspp:
            d3 = self._inner_aspp_dots(x3)
        else:
            d3 = self.model.apply(
                self.variables, x3, False, method=lambda m, a, t: m.ie_net.inner(a, t)
            )
        return d2s(self._dec2(d3) + x2p)

    def _inner_aspp_dots(self, x3):
        """inner (enc3 -> bottleneck+ASPP -> dec3 + skip) with the ASPP
        evaluated by `_aspp_dots` instead of the Flax module."""

        def st(method):
            return lambda a: self.model.apply(
                self.variables, a, False, method=lambda m, v, t: method(m.ie_net, v, t)
            )

        x4 = st(lambda ie, a, t: ie.enc3(a, t))(x3)
        x5 = st(lambda ie, a, t: ie.bottleneck1(a, t))(x4)
        x5 = self._aspp_dots(x5)
        x5 = st(lambda ie, a, t: ie.bottleneck2(a, t))(x5)
        return st(lambda ie, a, t: ie.dec3(a, t))(x5) + x3

    def _aspp_dots(self, x4):
        """Inference ASPP as MXU matmuls (reference: models/model.py:181-251).

        The dilated 3x3 branches (d=6/12/18 at /8) run as 9 shifted
        [H*W,256]@[256,256] dots each — XLA's dilated-conv emitter measured
        ~60 TF/s here (perf_lab `inner`) while plain dots run near peak. BN
        affines fold into the kernels; the fusion 1x1 distributes over the 5
        branches (fusion(cat(f_i)) == sum_i f_i @ W_i), so the 1280-channel
        concat (170 MB bf16 at 1080p b2) is never materialized. Exact up to
        float reassociation; Dropout is inference-identity."""
        p, s = self.p["ie_net"]["aspp"], self.s["ie_net"]["aspp"]
        dt = x4.dtype
        b, hh, ww, c = x4.shape

        def folded(name):
            sc, bi = _bn_affine(p[name]["BatchNorm_0"], s[name]["BatchNorm_0"])
            k = p[name]["Conv_0"]["kernel"] * sc
            return k.astype(dt), bi

        fk, f_bias = folded("fusion")  # [1,1,1280,256]
        wf = [fk[0, 0, 256 * i : 256 * (i + 1), :] for i in range(5)]

        def dot(v, w):
            return jax.lax.dot_general(
                v.reshape(-1, v.shape[-1]), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(*v.shape[:-1], w.shape[-1])

        def brelu(v, bias):
            return jax.nn.relu(v + bias.astype(jnp.float32)).astype(dt)

        k1, b1 = folded("conv1x1")
        acc = dot(brelu(dot(x4, k1[0, 0]), b1), wf[0]).astype(jnp.float32)

        for i, d in enumerate((6, 12, 18)):
            kd, bd = folded(f"aspp_branch{i}")
            xp = jnp.pad(x4, ((0, 0), (d, d), (d, d), (0, 0)))
            br = None
            for u in range(3):
                for v in range(3):
                    sl = xp[:, u * d : u * d + hh, v * d : v * d + ww, :]
                    t = dot(sl, kd[u, v])
                    br = t if br is None else br + t
            acc = acc + dot(brelu(br, bd), wf[i + 1]).astype(jnp.float32)

        kg, bg = folded("global_pool_conv")
        gap = x4.mean(axis=(1, 2), keepdims=True)
        gap = dot(brelu(dot(gap, kg[0, 0]), bg), wf[4]).astype(jnp.float32)
        acc = acc + gap  # bilinear upsample of a [b,1,1,c] map == broadcast

        return jax.nn.relu(acc + f_bias.astype(jnp.float32)).astype(dt)

    def _fam_packed(self, xp, fw, c=32, fold_kernel=None):
        """EnhancedFAM on packed [*, 4c] input; fw = a `_pack_fam` bundle.

        fold_kernel: optional packed 1x1 [1,1,4c,Co] applied to the FAM
        output (the caller's per-branch fusion slice) — folded into the tail
        kernel on TPU so the big tensor flows custom-call-to-custom-call.
        """
        k, bset = fw["k"], fw["b"]
        # Batch-aware: the whole-FAM kernel wins ~3 ms at b2 (netcfg) but
        # LOSES 51 ms at b8 (306.9 vs 255.4 ms, netcfg b8 round 3) — XLA's
        # conv emitters pipeline across the batch while the custom call
        # serializes it. Same pattern as the tail kernels below.
        if (
            self.cfg.fam_conv_fused
            and xp.shape[0] <= self.cfg.fam_fused_max_batch
            and jax.devices()[0].platform != "cpu"
            and fam_conv_supported(xp.shape)
        ):
            # Whole conv stage (4 branches + maxpool + fusion, 1x1s folded)
            # in one Pallas kernel: no branch intermediate ever hits HBM.
            # The ONE custom call that wins in-graph (netcfg: -4 ms).
            out = fam_conv_fused(
                xp, fw["ka"], fw["kb"], fw["dual_k1"], fw["dual_b1"],
                fw["k32f"], fw["k42f"], fw["bias_total"],
            )
        elif self.cfg.fam_xla_folded:
            # Folded XLA chain (same weight algebra as the fused kernel, run
            # through XLA's conv emitter): branch3/4 first convs merged into
            # ONE 128->256 conv (shared input, wider N tiles better), the
            # fusion 1x1's four row blocks folded into each branch's last
            # conv (ka/kb/k32f/k42f), all constants in bias_total — four
            # 1x1 fusion convs and two narrow convs disappear (~7% FLOPs).
            mid = _conv_auto(
                xp, fw["dual_k1"], bias=fw["dual_b1"], relu=True
            )  # [*, 256] = (branch3_mid | branch4_mid)
            b2 = maxpool3x3_s1_s2d(xp)
            out = jax.nn.relu(
                _conv(xp, jnp.asarray(fw["ka"])[None, None])
                + _conv(b2, jnp.asarray(fw["kb"])[None, None])
                + _conv(mid[..., :128], fw["k32f"])
                + _conv(mid[..., 128:], fw["k42f"])
                + fw["bias_total"].astype(xp.dtype)
            )
        else:
            b1 = _conv_auto(xp, k["branch1"], bias=bset["branch1"])
            b2 = maxpool3x3_s1_s2d(xp)
            b2 = _conv_auto(b2, k["branch2_conv"], bias=bset["branch2_conv"])
            b3 = _conv_auto(xp, k["branch3_conv1"], bias=bset["branch3_conv1"], relu=True)
            b3 = _conv_auto(b3, k["branch3_conv2"], bias=bset["branch3_conv2"])
            b4 = _conv_auto(xp, k["branch4_conv1"], bias=bset["branch4_conv1"], relu=True)
            b4 = _conv_auto(b4, k["branch4_conv2"], bias=bset["branch4_conv2"])

            kf = fw["parts"]
            out = jax.nn.relu(
                _conv(b1, kf[0]) + _conv(b2, kf[1]) + _conv(b3, kf[2]) + _conv(b4, kf[3])
                + _tile4(bset["fusion"]).astype(b1.dtype)
            )

        # Channel attention: true per-channel GAP = mean over packed spatial
        # AND quadrants.
        bsz = out.shape[0]
        gap = out.mean(axis=(1, 2)).reshape(bsz, 4, c).mean(axis=1)[:, None, None, :]
        ca = _conv(gap, fw["ca"]["ca_reduce"]["kernel"], fw["ca"]["ca_reduce"]["bias"])
        ca = jax.nn.relu(ca)
        ca = _conv(ca, fw["ca"]["ca_expand"]["kernel"], fw["ca"]["ca_expand"]["bias"])
        ca = jax.nn.sigmoid(ca)

        # Next to the famconv custom call with the fusion slice folded in,
        # the tail kernels win at SMALL batch (b2: 104.5 vs 105.0 ms,
        # netcfg); at throughput batches they LOSE big (b8: 131.5 vs 114.0
        # ms, netstages round 3 — the tail custom calls break XLA's
        # cross-batch pipelining of the attention chain). Batch-aware gate:
        # fold only at batch <= 2.
        use_tail_kernels = (
            self.cfg.fam_tail_fold
            and out.shape[0] <= self.cfg.fam_fused_max_batch
            and fold_kernel is not None
            and jax.devices()[0].platform != "cpu"
            and fam_tail_supported(out.shape)
        )
        if use_tail_kernels:
            ca_vec = _tile4(ca[:, 0, 0, :])  # [b, 128]
            sa_in = fam_tail_stats(out, ca_vec)
            sa = jax.nn.sigmoid(
                _conv_auto(sa_in, k["sa_conv"], bias=bset["sa_conv"])
            )
            if fold_kernel is not None:
                return fam_tail_apply_g1(out, ca_vec, sa, fold_kernel[0, 0])
            return fam_tail_apply(out, ca_vec, sa)

        out = out * _tile4(ca).astype(out.dtype)

        # Spatial attention per original pixel: per-quadrant channel mean/max,
        # interleaved into a packed 2-channel map.
        b_, hh, ww, _ = out.shape
        blocks = out.reshape(b_, hh, ww, 4, c)
        avg_map = blocks.mean(axis=-1)  # [b,h,w,4]
        max_map = blocks.max(axis=-1)
        if self.cfg.planar_sa:
            sa = self._sa_planar(avg_map, max_map, k["sa_conv"], bset["sa_conv"])
        else:
            sa_in = jnp.stack([avg_map, max_map], axis=-1).reshape(b_, hh, ww, 8)
            sa = jax.nn.sigmoid(_conv_auto(sa_in, k["sa_conv"], bias=bset["sa_conv"]))
        res = (blocks * sa[..., None]).reshape(b_, hh, ww, 4 * c)
        if fold_kernel is not None:
            res = _conv(res, fold_kernel)
        return res

    # ---------- full forward ----------

    def __call__(self, x):
        model, variables = self.model, self.variables
        if x.shape[1] % 2 or x.shape[2] % 2:  # odd dims: fall back to standard
            return model.apply(variables, x, train=False)
        xp = s2d(x).astype(model.dtype)  # compute dtype like the Flax modules

        # IENet full-res head/tail packed, middle via the Flax modules.
        # dec1_chain stays default-off: standalone it beats the XLA chain, but
        # the netcfg full-graph sweep shows a consistent ~12-16 ms layout/
        # fusion penalty around the custom call (126.3 vs 114.7 ms with it
        # off). perf_lab re-sweeps it via NetCfg(dec1_chain=True).
        use_fused = (
            self.cfg.dec1_chain
            and jax.devices()[0].platform != "cpu"
            and dec1_chain_supported((*xp.shape[:3], 128))
        )

        x1p = _conv_auto(xp, self.k_input, bias=self.b_input, relu=True)
        x2 = self._enc1(x1p)
        if x2.shape[1] % 2 == 0 and x2.shape[2] % 2 == 0:
            d2 = self._middle_packed(x2)
        else:
            d2 = model.apply(
                variables, x2, False, method=lambda m, a, t: m.ie_net.middle(a, t)
            )
        if use_fused:
            r = dec1_chain(
                d2, x1p,
                self.k_dec1_up, _tile4(self.b_dec1_up),
                self.dec1_k_c1f, self.dec1_b_c1f,
                self.dec1_k_c2f, self.dec1_b_c2f,
                self.k_rescv, _tile4(self.b_rescv),
            )
        else:
            d1p = self._dec1(d2) + x1p
            r = _conv_auto(d1p, self.k_rescv, bias=self.b_rescv, relu=True)
        res_p = _conv_auto(r, self.k_resout, bias=self.b_resout)  # [*, 4]
        mean_p = xp.reshape(*xp.shape[:-1], 4, 3).mean(axis=-1)  # [*, 4]
        illu = d2s(jax.nn.sigmoid(mean_p + res_p))  # packed 1-channel -> [B,H,W,1]

        reflectance = x / (illu + model.epsilon)

        h, w = x.shape[1], x.shape[2]
        x2s = resize_scale(x, 0.5)
        x3s = resize_scale(x, 0.25)
        h2, w2 = x2s.shape[1], x2s.shape[2]
        # Whether the fusion folds over the low-res towers (shapes refold
        # exactly) is static: towers pool by 2/4 with VALID windows.
        fold_ok = (
            4 * (h2 // 2) == h
            and 4 * (w2 // 2) == w
            and 16 * (x3s.shape[1] // 4) == h
            and 16 * (x3s.shape[2] // 4) == w
        )

        # Scale towers: scale1 and scale2 packed; scale3 (tiny) via Flax.
        # When the fusion folds, each tower's fusion 1x1 slice folds into its
        # FAM tail (custom-call-to-custom-call on TPU).
        f1p = _conv_auto(xp, self.k_s1conv, bias=self.b_s1conv, relu=True)
        g1 = self._fam_packed(
            f1p, self.fam1, fold_kernel=self.k_fusion_f1 if fold_ok else None
        )
        f1p = None if fold_ok else g1
        # scale2 = pool-2 -> 32ch conv -> FAM: the same narrow-conv shape at
        # half resolution, packed the same way (exact; the 2x2/s2 max-pool in
        # packed space is a per-quadrant channel max). In-graph the packed
        # form measures faster (netcfg full-model sweep: 131.7 vs 133.6
        # ms/batch(2)); standalone A/B deltas at this size are noise-level.
        use_packed_s2 = (
            self.cfg.packed_scale2
            and 2 * h2 == h and 2 * w2 == w and h2 % 4 == 0 and w2 % 4 == 0
        )
        f2p = None
        if use_packed_s2:
            x2p = s2d(x2s.astype(model.dtype))  # [B, h2/2, w2/2, 12]
            pooled = x2p.reshape(*x2p.shape[:3], 4, 3).max(axis=3)
            f2p = _conv_auto(s2d(pooled), self.k_s2conv, bias=self.b_s2conv, relu=True)
            f2p = self._fam_packed(
                f2p, self.fam2, fold_kernel=self.k_fusion_f2p if fold_ok else None
            )
            f2_h, f2_w = 2 * f2p.shape[1], 2 * f2p.shape[2]
        else:
            f2 = model.apply(variables, x2s, method=lambda m, a: m.scale2(a))
            f2_h, f2_w = f2.shape[1], f2.shape[2]
        f3 = model.apply(variables, x3s, method=lambda m, a: m.scale3(a))

        assert fold_ok == (
            4 * f2_h == h
            and 4 * f2_w == w
            and 16 * f3.shape[1] == h
            and 16 * f3.shape[2] == w
        )
        if fold_ok:
            if use_packed_s2:
                g2 = d2s(f2p)  # fusion slice already folded into the tail
            else:
                g2 = _conv(f2, self.w_fusion_f2)
            g3 = _conv(f3, self.w_fusion_f3)
            fused = (
                g1
                + s2d_upsample_mxu(g2, 4, mode=self.cfg.ups_mode).astype(g1.dtype)
                + s2d_upsample_mxu(g3, 16, mode=self.cfg.ups_mode).astype(g1.dtype)
                + _tile4(self.b_fusion).astype(g1.dtype)
            )
        else:  # shapes that don't refold exactly: the direct (resize) form
            f1p = g1  # unfolded (fold_kernel was None)
            if use_packed_s2:
                f2 = d2s(f2p)
            f2p = s2d(resize_bilinear(f2, h, w))
            f3p = s2d(resize_bilinear(f3, h, w))
            fused = _interleave_packed([f1p, f2p, f3p], 32)
            fused = _conv_auto(fused, self.k_fusion, bias=self.b_fusion)
        e_map = d2s(jax.nn.sigmoid(_conv_auto(fused, self.k_output, bias=self.b_output)))

        enhanced = reflectance * e_map + (1.0 - reflectance) * (e_map**2)
        return enhanced, reflectance, illu


def _interleave_packed(tensors, c):
    """Concatenate packed tensors per quadrant block (so a block-diagonal
    packed pointwise kernel sees [q, cat(channels)] layout)."""
    b, h, w, _ = tensors[0].shape
    parts = [t.reshape(b, h, w, 4, c) for t in tensors]
    return jnp.concatenate(parts, axis=-1).reshape(b, h, w, 4 * c * len(tensors))
