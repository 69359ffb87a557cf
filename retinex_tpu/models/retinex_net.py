"""The flagship model: illumination-estimation encoder-decoder + multi-scale
Retinex enhancement head, as Flax NHWC modules.

TPU-first re-design of the reference architecture
(reference: models/model.py:277-360 ResidualIENet, :363-455 MultiScaleUP_Retinex):
the whole forward — IENet U-path, Retinex decomposition S=X/I, three feature
towers with FAM attention, fusion and the enhancement-map formula
R*E + (1-R)*E^2 — compiles into a single XLA program. Input H,W must be
multiples of 8 (the encoder downsamples 8x; letterbox pads to /32).

Returns (enhanced, reflectance, illumination) with shapes
([B,H,W,3], [B,H,W,3], [B,H,W,1]), the NHWC analog of the reference's 3-tuple
(models/model.py:445-455). Reflectance is intentionally left unclamped, like
the reference (:405-413).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from retinex_tpu.models.layers import (
    ASPPModule,
    EnhancedFAM,
    PreActResBlock,
    ResBlock,
    UpBlock,
    max_pool_nonneg,
)
from retinex_tpu.ops.resize import resize_bilinear, resize_scale


class ResidualIENet(nn.Module):
    """Residual illumination estimator: 3->32 stem, 3 stride-2 residual stages
    (64/128/256), bottleneck (2 res blocks, optional ASPP between), 3 UpBlocks
    with additive skips, residual head; illumination =
    sigmoid(mean_RGB(x) + residual)."""

    use_preact: bool = False
    use_aspp: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        # setup-style (not @nn.compact) so the packed-inference path
        # (models/packed_inference.py) can run individual stages; the names
        # keep the param tree identical to the original compact layout.
        block = PreActResBlock if self.use_preact else ResBlock
        up = UpBlock
        if self.remat:
            # Rematerialized blocks: activations inside each block are
            # recomputed in the backward pass instead of stored — the
            # standard TPU HBM-for-FLOPs trade for bigger batches/images.
            # Matches the standard step to float-reassociation precision
            # (tests/test_remat.py); train arg is static (position 2 counting self).
            block = nn.remat(block, static_argnums=(2,))
            up = nn.remat(UpBlock, static_argnums=(2,))
        self.input_layer = nn.Conv(32, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype)
        self.enc1 = block(64, stride=2, dtype=self.dtype)
        self.enc2 = block(128, stride=2, dtype=self.dtype)
        self.enc3 = block(256, stride=2, dtype=self.dtype)
        self.bottleneck1 = block(256, dtype=self.dtype)
        if self.use_aspp:
            self.aspp = ASPPModule(256, dtype=self.dtype)
        self.bottleneck2 = block(256, dtype=self.dtype)
        self.dec3 = up(128, dtype=self.dtype)
        self.dec2 = up(64, dtype=self.dtype)
        self.dec1 = up(32, dtype=self.dtype)
        self.residual_conv = nn.Conv(32, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype)
        self.residual_out = nn.Conv(1, (1, 1), dtype=self.dtype)

    def middle(self, x2, train: bool = False):
        """enc2 -> bottleneck -> dec3/dec2 with skips: the /2-and-below body
        (everything except the full-resolution stages)."""
        x3 = self.enc2(x2, train)
        d3 = self.inner(x3, train)
        return self.dec2(d3, train) + x2

    def inner(self, x3, train: bool = False):
        """enc3 -> bottleneck (+ASPP) -> dec3 with skip: the /4-and-below
        body (models/packed_inference.py runs enc2/dec2 s2d-packed and calls
        this for the rest)."""
        x4 = self.enc3(x3, train)
        x5 = self.bottleneck1(x4, train)
        if self.use_aspp:
            x5 = self.aspp(x5, train)
        x5 = self.bottleneck2(x5, train)
        return self.dec3(x5, train) + x3

    def __call__(self, x, train: bool = False):
        x1 = nn.relu(self.input_layer(x))
        x2 = self.enc1(x1, train)
        d2 = self.middle(x2, train)
        d1 = self.dec1(d2, train) + x1

        r = nn.relu(self.residual_conv(d1))
        residual = self.residual_out(r)

        mean_illumination = jnp.mean(x, axis=-1, keepdims=True)
        return nn.sigmoid(mean_illumination + residual)


class ScaleTower(nn.Module):
    """Per-scale feature tower: optional max-pool downsample, 3x3 conv + ReLU,
    EnhancedFAM (reference: models/model.py:381-399)."""

    pool: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pool > 1:
            # Zero-init pool (input is a [0,1] image): see max_pool_nonneg on
            # why -inf init breaks under spatial sharding.
            x = max_pool_nonneg(x, (self.pool, self.pool), strides=(self.pool, self.pool))
        x = nn.relu(nn.Conv(32, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv")(x))
        return EnhancedFAM(32, dtype=self.dtype, name="fam")(x)


class MultiScaleUPRetinex(nn.Module):
    """Unsupervised physics-guided Retinex network with multi-scale enhancement.

    Defaults use_preact=True/use_aspp=True mirror the reference class defaults
    (models/model.py:375). NOTE(PARITY.md): the reference CLI constructs the
    model with both flags OFF while its enhance/predict scripts construct with
    defaults ON — a checkpoint-compatibility trap we surface via explicit
    config instead.
    """

    use_preact: bool = True
    use_aspp: bool = True
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-6
    remat: bool = False  # rematerialize IE-net blocks + scale towers in training

    def setup(self):
        self.ie_net = ResidualIENet(
            self.use_preact, self.use_aspp, dtype=self.dtype, remat=self.remat
        )
        tower = nn.remat(ScaleTower) if self.remat else ScaleTower
        self.scale1 = tower(pool=1, dtype=self.dtype)
        self.scale2 = tower(pool=2, dtype=self.dtype)
        self.scale3 = tower(pool=4, dtype=self.dtype)
        self.fusion = nn.Conv(32, (1, 1), dtype=self.dtype)
        self.output_layer = nn.Conv(3, (1, 1), dtype=self.dtype)

    def retinex_decompose(self, x, illu):
        """S = X / I with epsilon regularization; unclamped like the reference."""
        return x / (illu + self.epsilon)

    def multi_scale_enhance(self, x, reflectance, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        # The reference feeds scale towers with *bilinear* half/quarter inputs
        # and the towers additionally max-pool (models/model.py:415-427), so
        # f2 is at 1/4 and f3 at 1/16 resolution.
        x2 = resize_scale(x, 0.5)
        x3 = resize_scale(x, 0.25)
        f1 = self.scale1(x)
        f2 = resize_bilinear(self.scale2(x2), h, w)
        f3 = resize_bilinear(self.scale3(x3), h, w)
        fused = self.fusion(jnp.concatenate([f1, f2, f3], axis=-1))
        e_map = nn.sigmoid(self.output_layer(fused))
        return reflectance * e_map + (1.0 - reflectance) * (e_map**2)

    def __call__(self, x, train: bool = False):
        illu = self.ie_net(x, train)
        reflectance = self.retinex_decompose(x, illu)
        enhanced = self.multi_scale_enhance(x, reflectance, train)
        return enhanced, reflectance, illu


# Back-compat alias mirroring the reference's UP_Retinex name (models/model.py:459).
UPRetinex = MultiScaleUPRetinex


def count_parameters(params) -> int:
    """Total parameter count of a Flax params pytree."""
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))
