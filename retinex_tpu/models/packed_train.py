"""Space-to-depth packed TRAINING for MultiScaleUPRetinex.

The train step is bounded by the same narrow-conv MXU floor as inference
(BENCH_NOTES.md round-3 trainsplit: a 256px b4 step is ~6x the forward and
virtually all of it is conv forward+backward at 32-64 channels, ~7% MFU).
This module evaluates the train-mode forward with the full-resolution and
half-resolution stages rewritten in s2d-packed space — the same exact
transform `models/packed_inference.py` applies to inference — so both the
forward convs AND their backward (input-grad and weight-grad) convolutions
run 128/256 channels wide on the MXU.

Design constraints that differ from packed inference:
- Gradients must flow to the ORIGINAL Flax parameters (checkpoints,
  optimizer state, and resume stay byte-compatible with the standard path),
  so kernels are packed INSIDE the traced step via the differentiable
  `ops/s2d.pack_*_t` transforms (pure 0/1-placement einsums; packing f32
  weights then casting equals casting then packing).
- BatchNorm runs in TRAIN mode: batch statistics are computed phase-aware on
  packed layouts (a packed [B,H/2,W/2,4C] tensor holds exactly the original
  [B,H,W,C] values, so reducing over batch, packed-spatial AND the 4
  quadrant phases reproduces flax's per-channel stats up to reassociation),
  and the running stats are updated with flax's momentum-0.9 rule
  (layers.py: torch-parity momentum 0.1).
- No Pallas custom calls (no VJPs; they are batch-gated off at train batch
  sizes anyway — BENCH_NOTES round 3).

The /4-and-below body (enc3..dec3, ASPP with its train-mode dropout) and the
tiny scale-3 tower run through the regular Flax modules; their batch_stats
updates merge with the manually-computed packed-stage stats into the same
pytree layout `model.init` creates.

Reference behavior being trained: trainers/train.py:27-131 hot loop over
models/model.py:445-455 forward. Exactness vs the standard Flax train-mode
apply (outputs, batch-stats updates, and loss gradients) is tested in
tests/test_packed_train.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from retinex_tpu.models.packed_inference import _conv, _interleave_packed, _tile4
from retinex_tpu.ops.resize import resize_bilinear, resize_scale
from retinex_tpu.ops.s2d import (
    conv_s2d,
    d2s,
    maxpool3x3_s1_s2d,
    pack_convtranspose2_t,
    pack_kernel_s1_t,
    pack_kernel_s2_t,
    pack_pointwise_t,
    s2d,
    s2d_upsample_mxu,
)

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.9  # flax momentum (torch-parity 0.1), models/layers.py:_bn


def _bn_train(x, p, s, phases: int = 1):
    """Train-mode BatchNorm on an NHWC (or packed NHW(4C)) tensor.

    phases=4 treats channels as (quadrant, channel) blocks: statistics reduce
    over batch, spatial AND quadrants, matching the unpacked per-channel
    stats. Mirrors flax.linen.BatchNorm numerics: f32 fast-variance
    (E[x^2] - E[x]^2, clipped at 0), lax.rsqrt, cast back to x.dtype.
    Returns (normalized, {"mean": new_running_mean, "var": new_running_var}).
    """
    xf = x.astype(jnp.float32)
    if phases > 1:
        c = x.shape[-1] // phases
        xr = xf.reshape(*x.shape[:-1], phases, c)
        axes = tuple(range(xr.ndim - 1))
        mean = jnp.mean(xr, axes)
        mean2 = jnp.mean(xr * xr, axes)
    else:
        axes = tuple(range(xf.ndim - 1))
        mean = jnp.mean(xf, axes)
        mean2 = jnp.mean(xf * xf, axes)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    scale = p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32)
    y = (xf - _rep(mean, phases)) * _rep(jax.lax.rsqrt(var + _BN_EPS) * scale, phases)
    y = y + _rep(bias, phases)
    new_s = {
        "mean": _BN_MOMENTUM * s["mean"] + (1.0 - _BN_MOMENTUM) * mean,
        "var": _BN_MOMENTUM * s["var"] + (1.0 - _BN_MOMENTUM) * var,
    }
    return y.astype(x.dtype), new_s


def _rep(v, phases):
    return jnp.tile(v, phases) if phases > 1 else v


def _enc_block_train(xp, p, s, use_preact):
    """Stride-2 residual block on packed input [*, 4Cin] -> unpacked [*, Cout]
    at the packed resolution (models/layers.py ResBlock/PreActResBlock).
    Returns (out, bn_updates)."""
    upd = {}
    k_conv1 = pack_kernel_s2_t(p["conv1"]["kernel"])
    k_short = pack_kernel_s2_t(p["shortcut_conv"]["kernel"])
    if use_preact:
        pre, upd["bn1"] = _bn_train(xp, p["bn1"], s["bn1"], phases=4)
        pre = jax.nn.relu(pre)
        short = conv_s2d(pre, k_short)
        short, upd["shortcut_bn"] = _bn_train(short, p["shortcut_bn"], s["shortcut_bn"])
        y = conv_s2d(pre, k_conv1)
        y, upd["bn2"] = _bn_train(y, p["bn2"], s["bn2"])
        y = _conv(jax.nn.relu(y), p["conv2"]["kernel"])
        return y + short, upd
    y = conv_s2d(xp, k_conv1)
    y, upd["bn1"] = _bn_train(y, p["bn1"], s["bn1"])
    y = _conv(jax.nn.relu(y), p["conv2"]["kernel"])
    y, upd["bn2"] = _bn_train(y, p["bn2"], s["bn2"])
    short = conv_s2d(xp, k_short)
    short, upd["shortcut_bn"] = _bn_train(short, p["shortcut_bn"], s["shortcut_bn"])
    return jax.nn.relu(y + short), upd


def _up_block_train(d, p, s):
    """UpBlock (ConvTranspose k2s2 + 2x conv-BN-ReLU) from unpacked input to
    PACKED 2x-resolution output [*, 4Cout]. Returns (out, bn_updates)."""
    upd = {}
    y = _conv(d, pack_convtranspose2_t(p["up"]["kernel"]), _tile4(p["up"]["bias"]))
    for name in ("conv1", "conv2"):
        y = conv_s2d(y, pack_kernel_s1_t(p[name]["Conv_0"]["kernel"]),
                     bias=p[name]["Conv_0"]["bias"])
        y, bn = _bn_train(y, p[name]["BatchNorm_0"], s[name]["BatchNorm_0"], phases=4)
        upd[name] = {"BatchNorm_0": bn}
        y = jax.nn.relu(y)
    return y, upd


def _fam_train(xp, p, c=32):
    """EnhancedFAM (models/layers.py:65-108) on packed [*, 4c] input.

    Pure-XLA packed path (no custom calls): branches packed, fusion applied
    as its four per-branch row blocks (skips the 4c-concat interleave),
    channel attention with quadrant-aware GAP, spatial attention on the
    packed per-quadrant [avg|max] map.
    """
    b1 = conv_s2d(xp, pack_pointwise_t(p["branch1"]["kernel"]), bias=p["branch1"]["bias"])
    b2 = maxpool3x3_s1_s2d(xp)
    b2 = conv_s2d(b2, pack_pointwise_t(p["branch2_conv"]["kernel"]),
                  bias=p["branch2_conv"]["bias"])
    b3 = jax.nn.relu(conv_s2d(xp, pack_kernel_s1_t(p["branch3_conv1"]["kernel"]),
                              bias=p["branch3_conv1"]["bias"]))
    b3 = conv_s2d(b3, pack_kernel_s1_t(p["branch3_conv2"]["kernel"]),
                  bias=p["branch3_conv2"]["bias"])
    b4 = jax.nn.relu(conv_s2d(xp, pack_kernel_s1_t(p["branch4_conv1"]["kernel"]),
                              bias=p["branch4_conv1"]["bias"]))
    b4 = conv_s2d(b4, pack_kernel_s1_t(p["branch4_conv2"]["kernel"], dilation=2),
                  bias=p["branch4_conv2"]["bias"])

    kfu = p["fusion"]["kernel"]  # [1,1,4c,c], input rows ordered (branch, c)
    parts = [pack_pointwise_t(kfu[:, :, c * i : c * (i + 1), :]) for i in range(4)]
    out = jax.nn.relu(
        _conv(b1, parts[0]) + _conv(b2, parts[1]) + _conv(b3, parts[2])
        + _conv(b4, parts[3]) + _tile4(p["fusion"]["bias"]).astype(b1.dtype)
    )

    # SE channel attention: true per-channel GAP = mean over packed spatial
    # and quadrants (equal counts, so mean-of-means is exact).
    bsz = out.shape[0]
    gap = out.mean(axis=(1, 2)).reshape(bsz, 4, c).mean(axis=1)[:, None, None, :]
    ca = jax.nn.relu(_conv(gap, p["ca_reduce"]["kernel"], p["ca_reduce"]["bias"]))
    ca = jax.nn.sigmoid(_conv(ca, p["ca_expand"]["kernel"], p["ca_expand"]["bias"]))
    out = out * _tile4(ca).astype(out.dtype)

    # CBAM spatial attention per original pixel, on the packed quadrant map.
    b_, hh, ww, _ = out.shape
    blocks = out.reshape(b_, hh, ww, 4, c)
    avg_map = blocks.mean(axis=-1)
    max_map = blocks.max(axis=-1)
    sa_in = jnp.stack([avg_map, max_map], axis=-1).reshape(b_, hh, ww, 8)
    sa = jax.nn.sigmoid(
        conv_s2d(sa_in, pack_kernel_s1_t(p["sa_conv"]["kernel"]), bias=p["sa_conv"]["bias"])
    )
    return (blocks * sa[..., None]).reshape(b_, hh, ww, 4 * c)


def packed_train_apply(model, params, batch_stats, x, dropout_rng):
    """Train-mode forward, packed. Equals (up to float reassociation)

        model.apply({"params": params, "batch_stats": batch_stats}, x,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": dropout_rng})

    returning ((enhanced, reflectance, illu), new_batch_stats).
    Requires H, W divisible by 32 (letterbox guarantees this in training).

    When the model was built with remat=True, each resolution stage (full-res
    encode, enc2, dec2, dec1+illumination, the two packed scale towers, and
    the fusion head) is wrapped in jax.checkpoint: the backward pass
    recomputes the stage activations instead of storing them, cutting peak
    HBM roughly in half at 640px (the /4-and-below inner body and scale3 run
    through the Flax modules, which nn.remat already wraps). Gradients match
    the non-remat packed step to last-ulp/fusion tolerance — 1e-5 relative,
    the recompute may re-fuse FMAs (tests/test_packed_train.py).
    """
    dtype = model.dtype
    remat = getattr(model, "remat", False)
    ckpt = jax.checkpoint if remat else (lambda f: f)
    p = params
    ie, ie_s = p["ie_net"], batch_stats["ie_net"]
    ie_upd = {}

    xp = s2d(x).astype(dtype)

    @ckpt
    def _full_res_encode(xp_, p_in, p_enc1, s_enc1):
        x1p_ = jax.nn.relu(
            conv_s2d(xp_, pack_kernel_s1_t(p_in["kernel"]), bias=p_in["bias"])
        )
        x2_, upd_ = _enc_block_train(x1p_, p_enc1, s_enc1, model.use_preact)
        return x1p_, x2_, upd_

    x1p, x2, ie_upd["enc1"] = _full_res_encode(
        xp, ie["input_layer"], ie["enc1"], ie_s["enc1"]
    )

    # middle: enc2/dec2 packed; the /4-and-below body via the Flax modules
    # (train-mode BN + ASPP dropout; the dropout rng path matches the full
    # apply because the module tree and rng fold path are identical).
    x2p = s2d(x2)
    x3, ie_upd["enc2"] = ckpt(
        lambda a, b, c: _enc_block_train(a, b, c, model.use_preact)
    )(x2p, ie["enc2"], ie_s["enc2"])
    d3, inner_upd = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x3,
        True,
        method=lambda m, a, t: m.ie_net.inner(a, t),
        mutable=["batch_stats"],
        rngs={"dropout": dropout_rng},
    )
    # mutable=["batch_stats"] returns the WHOLE collection, including
    # untouched entries at their input values — merge only the subtrees
    # inner() actually owns or they'd overwrite the manual packed-stage stats.
    inner_keys = ("enc3", "bottleneck1", "bottleneck2", "dec3") + (
        ("aspp",) if model.use_aspp else ()
    )
    for key in inner_keys:
        ie_upd[key] = inner_upd["batch_stats"]["ie_net"][key]
    dec2_out, ie_upd["dec2"] = ckpt(_up_block_train)(d3, ie["dec2"], ie_s["dec2"])
    d2 = d2s(dec2_out + x2p)

    @ckpt
    def _dec1_illu(d2_, x1p_, x_, p_dec1, s_dec1, p_rc, p_ro):
        dec1_out_, upd_ = _up_block_train(d2_, p_dec1, s_dec1)
        d1p_ = dec1_out_ + x1p_
        r_ = jax.nn.relu(
            conv_s2d(d1p_, pack_kernel_s1_t(p_rc["kernel"]), bias=p_rc["bias"])
        )
        res_p_ = conv_s2d(r_, pack_pointwise_t(p_ro["kernel"]), bias=p_ro["bias"])
        mean_p_ = s2d(jnp.mean(x_, axis=-1, keepdims=True))  # f32, flax-order mean
        return d2s(jax.nn.sigmoid(mean_p_ + res_p_)), upd_

    illu, ie_upd["dec1"] = _dec1_illu(
        d2, x1p, x, ie["dec1"], ie_s["dec1"], ie["residual_conv"], ie["residual_out"]
    )
    reflectance = x / (illu + model.epsilon)

    # Scale towers: scale1/scale2 packed, scale3 (1/16 res, tiny) via Flax.
    h, w = x.shape[1], x.shape[2]

    @ckpt
    def _scale_tower(inp, p_conv, p_fam):
        f = jax.nn.relu(
            conv_s2d(inp, pack_kernel_s1_t(p_conv["kernel"]), bias=p_conv["bias"])
        )
        return _fam_train(f, p_fam)

    f1p = _scale_tower(xp, p["scale1"]["conv"], p["scale1"]["fam"])

    x2s = resize_scale(x, 0.5)
    x2sp = s2d(x2s.astype(dtype))
    pooled = x2sp.reshape(*x2sp.shape[:3], 4, 3).max(axis=3)  # 2x2/s2 max-pool
    f2p = _scale_tower(s2d(pooled), p["scale2"]["conv"], p["scale2"]["fam"])

    x3s = resize_scale(x, 0.25)
    f3 = model.apply({"params": params}, x3s, method=lambda m, a: m.scale3(a))

    # Fusion: upsample scale-2/3 features to full res in packed space. The
    # MXU-matmul phase upsample equals s2d(resize_bilinear(...)) and applies
    # when the shapes refold exactly (always, for /32 letterboxed inputs).
    @ckpt
    def _fusion_head(f1p_, f2p_, f3_, p_fu, p_out):
        f2_ = d2s(f2p_)
        if 4 * f2_.shape[1] == h and 4 * f2_.shape[2] == w:
            f2ps_ = s2d_upsample_mxu(f2_, 4, mode=1).astype(dtype)
        else:
            f2ps_ = s2d(resize_bilinear(f2_, h, w)).astype(dtype)
        if 16 * f3_.shape[1] == h and 16 * f3_.shape[2] == w:
            f3ps_ = s2d_upsample_mxu(f3_, 16, mode=1).astype(dtype)
        else:
            f3ps_ = s2d(resize_bilinear(f3_, h, w)).astype(dtype)
        fused_ = _interleave_packed([f1p_, f2ps_, f3ps_], 32)
        fused_ = conv_s2d(fused_, pack_pointwise_t(p_fu["kernel"]), bias=p_fu["bias"])
        return d2s(jax.nn.sigmoid(
            conv_s2d(fused_, pack_pointwise_t(p_out["kernel"]), bias=p_out["bias"])
        ))

    e_map = _fusion_head(f1p, f2p, f3, p["fusion"], p["output_layer"])

    enhanced = reflectance * e_map + (1.0 - reflectance) * (e_map**2)
    return (enhanced, reflectance, illu), {"ie_net": ie_upd}
