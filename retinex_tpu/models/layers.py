"""Building-block Flax modules (NHWC, bf16-capable).

TPU-first re-design of the reference's block zoo (models/model.py:11-274):
- EnhancedFAM: 4-branch feature aggregation + SE channel attention + CBAM-style
  spatial attention (reference: models/model.py:11-97).
- ResBlock / PreActResBlock: post/pre-activation residual conv blocks with
  projection shortcuts (reference: models/model.py:100-178).
- ASPPModule: dilated-conv pyramid + global-pool branch (reference:
  models/model.py:181-251).
- UpBlock: stride-2 transposed conv + 2x conv-BN-ReLU (reference:
  models/model.py:254-274).

All convolutions run in NHWC with a configurable compute dtype (params stay
f32); XLA maps the 3x3 convs onto the MXU and fuses the BN/ReLU chains.
BatchNorm uses torch-parity momentum 0.1 (flax momentum=0.9) and eps 1e-5.

NOTE(divergence, PARITY.md): the reference's ASPP global-pool branch crashes in
torch train mode at batch_size=1 (BatchNorm over a [B,C,1,1] tensor); the JAX
BatchNorm computes batch statistics without that restriction, so we simply work.
"""

from __future__ import annotations

from collections.abc import Callable

import flax.linen as nn
import jax.numpy as jnp

from retinex_tpu.ops.resize import resize_bilinear


def max_pool_nonneg(x, window: tuple[int, int], strides: tuple[int, int], padding=((0, 0), (0, 0))):
    """Max pool over H,W of NHWC for NON-NEGATIVE inputs, without reduce_window.

    Equivalent to nn.max_pool for inputs >= 0 (zero padding instead of -inf:
    a border max that already holds a value >= 0 absorbs the extra 0) — which
    all pools in this model see (post-ReLU features, [0,1] images).

    Why not nn.max_pool: XLA's SPMD partitioner mis-handles reduce_window
    halos when the pooled operand is spatially sharded inside a multi-branch
    fan-out (FAM's 4 branches) — the init/padding value leaks into boundary
    windows (verified on jax 0.9.0 CPU with a minimal repro: -inf init makes
    the downstream convs NaN; a finite-lowest init leaks +-3e38). The forms
    here (reshape-max for window==stride pooling, shifted-slice maxima for
    stride-1 windows) partition exactly under GSPMD and differentiate cleanly
    (reduce_window's autodiff rule only matches the -inf max monoid), so the
    spatially-sharded forward (parallel/spatial.py) and the train step both
    work. Subgradient at ties distributes like jnp.maximum chains rather than
    select-and-scatter — an accepted divergence (ties are measure-zero).
    """
    kh, kw = window
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = tuple(tuple(p) for p in padding)
    n, h, w, c = x.shape
    if (kh, kw) == (sh, sw) and (ph0, ph1, pw0, pw1) == (0, 0, 0, 0):
        # Non-overlapping pooling: a free reshape + max over the window axes.
        # VALID semantics: crop the remainder rows/cols like reduce_window does.
        oh, ow = h // kh, w // kw
        x = x[:, : oh * kh, : ow * kw]
        return x.reshape(n, oh, kh, ow, kw, c).max(axis=(2, 4))
    if (sh, sw) != (1, 1):
        raise NotImplementedError("max_pool_nonneg: only window==stride or stride-1 pools")
    y = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    hp, wp = y.shape[1], y.shape[2]
    out = y[:, 0 : hp - kh + 1]
    for i in range(1, kh):
        out = jnp.maximum(out, y[:, i : hp - kh + 1 + i])
    res = out[:, :, 0 : wp - kw + 1]
    for j in range(1, kw):
        res = jnp.maximum(res, out[:, :, j : wp - kw + 1 + j])
    return res


def _bn(dtype, name=None):
    return nn.BatchNorm(
        use_running_average=None,  # provided via module arg
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation * (self.kernel // 2),) * 2] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class EnhancedFAM(nn.Module):
    """4-branch feature aggregation with channel + spatial attention."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        conv = lambda feats, k, d=1, name=None: nn.Conv(  # noqa: E731
            feats,
            (k, k),
            kernel_dilation=(d, d),
            padding=[(d * (k // 2),) * 2] * 2,
            dtype=self.dtype,
            name=name,
        )
        # Branch 1: pointwise.
        b1 = conv(f, 1, name="branch1")(x)
        # Branch 2: 3x3 max-pool (stride 1) then pointwise.
        b2 = max_pool_nonneg(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
        b2 = conv(f, 1, name="branch2_conv")(b2)
        # Branch 3: cascaded 3x3s.
        b3 = nn.relu(conv(f, 3, name="branch3_conv1")(x))
        b3 = conv(f, 3, name="branch3_conv2")(b3)
        # Branch 4: 3x3 then dilated 3x3.
        b4 = nn.relu(conv(f, 3, name="branch4_conv1")(x))
        b4 = conv(f, 3, d=2, name="branch4_conv2")(b4)

        out = jnp.concatenate([b1, b2, b3, b4], axis=-1)
        out = nn.relu(conv(f, 1, name="fusion")(out))

        # SE-style channel attention: GAP -> C/16 -> C -> sigmoid.
        ca = jnp.mean(out, axis=(1, 2), keepdims=True)
        ca = nn.relu(conv(f // 16, 1, name="ca_reduce")(ca))
        ca = nn.sigmoid(conv(f, 1, name="ca_expand")(ca))
        out = out * ca

        # CBAM-style spatial attention: [mean_c, max_c] -> 7x7 conv -> sigmoid.
        avg_map = jnp.mean(out, axis=-1, keepdims=True)
        max_map = jnp.max(out, axis=-1, keepdims=True)
        sa = jnp.concatenate([avg_map, max_map], axis=-1)
        sa = nn.sigmoid(conv(1, 7, name="sa_conv")(sa))
        return out * sa


class ResBlock(nn.Module):
    """Post-activation residual block, optional stride-2 downsample."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_feats = x.shape[-1]
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride,) * 2, padding=[(1, 1)] * 2,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype, name="conv2"
        )(y)
        y = norm("bn2")(y)
        if self.stride != 1 or in_feats != self.features:
            sc = nn.Conv(
                self.features, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                dtype=self.dtype, name="shortcut_conv",
            )(x)
            sc = norm("shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class PreActResBlock(nn.Module):
    """Pre-activation residual block: BN-ReLU precede each conv; when a
    projection shortcut is needed it is taken from the pre-activated tensor
    (reference: models/model.py:164-177)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_feats = x.shape[-1]
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        pre = nn.relu(norm("bn1")(x))
        needs_proj = self.stride != 1 or in_feats != self.features
        if needs_proj:
            sc = nn.Conv(
                self.features, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                dtype=self.dtype, name="shortcut_conv",
            )(pre)
            sc = norm("shortcut_bn")(sc)
        else:
            sc = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride,) * 2, padding=[(1, 1)] * 2,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(pre)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype, name="conv2"
        )(y)
        return y + sc


class ASPPModule(nn.Module):
    """Atrous spatial pyramid pooling with a global-average-pool branch."""

    features: int
    dilations: tuple[int, ...] = (1, 6, 12, 18)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        feats = [ConvBNReLU(self.features, kernel=1, dtype=self.dtype, name="conv1x1")(x, train)]
        for i, d in enumerate(self.dilations[1:]):
            feats.append(
                ConvBNReLU(
                    self.features, kernel=3, dilation=d, dtype=self.dtype, name=f"aspp_branch{i}"
                )(x, train)
            )
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBNReLU(self.features, kernel=1, dtype=self.dtype, name="global_pool_conv")(gp, train)
        gp = resize_bilinear(gp, h, w)
        feats.append(gp)
        out = jnp.concatenate(feats, axis=-1)
        out = ConvBNReLU(self.features, kernel=1, dtype=self.dtype, name="fusion")(out, train)
        out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        return out


class UpBlock(nn.Module):
    """2x upsample: ConvTranspose(k2,s2) then two conv-BN-ReLU stages."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), dtype=self.dtype, name="up"
        )(x)
        x = ConvBNReLU(self.features, use_bias=True, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBNReLU(self.features, use_bias=True, dtype=self.dtype, name="conv2")(x, train)
        return x
