"""The seven unsupervised losses as pure jnp functions (NHWC, float [0,1]).

Each mirrors a reference module in losses/loss.py, including its quirks (each
documented in place); all are scalar-valued, jit/grad-safe, and fuse into the
train step. Golden-tested against the torch reference in
tests/test_losses_parity.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from retinex_tpu.ops.filters import forward_diff, sobel_edge_map


def _gray(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=-1, keepdims=True)


def exposure_loss(
    img_enhanced: jnp.ndarray,
    img_low: jnp.ndarray,
    patch_size: int = 16,
    base_target: float = 0.6,
) -> jnp.ndarray:
    """Adaptive exposure control (reference: losses/loss.py:12-58).

    Gray patch means of the enhanced image vs an adaptive target
    E = base + (0.8-base)*(1-mean(gray_low)); L1 over patches.
    """
    gray_enh = _gray(img_enhanced)
    gray_low = _gray(img_low)
    global_mean = jnp.mean(gray_low)
    target = base_target + (0.8 - base_target) * (1.0 - global_mean)
    b, h, w, _ = gray_enh.shape
    ph, pw = h // patch_size, w // patch_size
    # torch avg_pool2d floors: ignore any remainder rows/cols.
    cropped = gray_enh[:, : ph * patch_size, : pw * patch_size, 0]
    patches = cropped.reshape(b, ph, patch_size, pw, patch_size).mean(axis=(2, 4))
    return jnp.mean(jnp.abs(patches - target))


def smoothness_loss(
    illu_map: jnp.ndarray,
    img_low: jnp.ndarray,
    lambda_val: float = 10.0,
    alpha: float = 1.0,
) -> jnp.ndarray:
    """Edge-aware TV smoothness of the illumination map
    (reference: losses/loss.py:61-176).

    TV of illu weighted by exp(-lambda*mean_c|grad S|) and a per-row/column
    global edge factor. NOTE(reference quirk, kept): the reference's
    avg_pool2d with kernel (1, W-1)/(H-1, 1) collapses an entire row/column,
    producing [B,H,1]/[B,1,W] broadcast factors equal to
    1 + alpha * mean(edge_map[..., :-1]) along that row/column
    (losses/loss.py:167-168).
    """
    illu_gh, illu_gv = forward_diff(illu_map)
    img_gh, img_gv = forward_diff(img_low)

    weight_h = jnp.exp(-lambda_val * jnp.mean(jnp.abs(img_gh), axis=-1, keepdims=True))
    weight_v = jnp.exp(-lambda_val * jnp.mean(jnp.abs(img_gv), axis=-1, keepdims=True))

    edge = sobel_edge_map(img_low)  # [B,H,W,1]
    # Row factor: mean over the first W-1 columns of each row -> [B,H,1,1].
    edge_factor_h = 1.0 + alpha * jnp.mean(edge[:, :, :-1, :], axis=2, keepdims=True)
    # Column factor: mean over the first H-1 rows of each column -> [B,1,W,1].
    edge_factor_v = 1.0 + alpha * jnp.mean(edge[:, :-1, :, :], axis=1, keepdims=True)

    loss_h = jnp.mean(weight_h * edge_factor_h * jnp.abs(illu_gh))
    loss_v = jnp.mean(weight_v * edge_factor_v * jnp.abs(illu_gv))
    return loss_h + loss_v


def color_loss(img_enhanced: jnp.ndarray) -> jnp.ndarray:
    """Gray-world color constancy: squared pairwise differences of global
    per-channel means (reference: losses/loss.py:337-371)."""
    means = jnp.mean(img_enhanced, axis=(0, 1, 2))
    mr, mg, mb = means[0], means[1], means[2]
    return (mr - mg) ** 2 + (mr - mb) ** 2 + (mg - mb) ** 2


def spatial_consistency_loss(img_enhanced: jnp.ndarray, img_low: jnp.ndarray) -> jnp.ndarray:
    """MSE between forward-difference gradients of enhanced and input
    (reference: losses/loss.py:374-427)."""
    egh, egv = forward_diff(img_enhanced)
    lgh, lgv = forward_diff(img_low)
    return jnp.mean((egh - lgh) ** 2) + jnp.mean((egv - lgv) ** 2)


def decoupling_loss(
    illu_map: jnp.ndarray, reflectance: jnp.ndarray, lambda_val: float = 0.1
) -> jnp.ndarray:
    """Illumination-reflectance decoupling (reference: losses/loss.py:258-334).

    ||cross-cov||_F^2 + lambda*MSE(channel-avg means). NOTE(reference quirk,
    kept): for the 1-vs-3-channel case the reference correlates the
    *uncentered* replicated illumination against centered reflectance
    (losses/loss.py:311-312 uses illu_flat, not illu_centered).
    """
    b, h, w, c_illu = illu_map.shape
    c_refl = reflectance.shape[-1]
    n = h * w
    illu_flat = illu_map.reshape(b, n, c_illu)
    refl_flat = reflectance.reshape(b, n, c_refl)
    illu_mean = jnp.mean(illu_flat, axis=1, keepdims=True)
    refl_mean = jnp.mean(refl_flat, axis=1, keepdims=True)
    refl_centered = refl_flat - refl_mean

    if c_illu == c_refl:
        illu_centered = illu_flat - illu_mean
        cov = (
            jnp.einsum("bnc,bnd->bcd", illu_centered, refl_centered, precision=lax.Precision.HIGHEST)
            / (n - 1)
        )
        mean_diff = jnp.mean((illu_mean - refl_mean) ** 2)
    else:
        # Replicated, uncentered illumination (the reference quirk).
        illu_rep = jnp.broadcast_to(illu_flat, (b, n, c_refl))
        cov = (
            jnp.einsum("bnc,bnd->bcd", illu_rep, refl_centered, precision=lax.Precision.HIGHEST)
            / (n - 1)
        )
        mean_diff = jnp.mean(
            (jnp.mean(illu_mean, axis=2) - jnp.mean(refl_mean, axis=2)) ** 2
        )
    cov_loss = jnp.sum(cov**2)  # squared Frobenius norm over the whole [B,C,C]
    return cov_loss + lambda_val * mean_diff


def perceptual_loss(vgg_apply, img_enhanced: jnp.ndarray, img_low: jnp.ndarray) -> jnp.ndarray:
    """VGG feature-space MSE between enhanced and *input* at three depths
    (reference: losses/loss.py:179-255). `vgg_apply(x) -> (f1, f2, f3)` is a
    bound VGG19Features apply (see models/vgg.py)."""
    fe = vgg_apply(img_enhanced)
    fl = vgg_apply(img_low)
    return sum(jnp.mean((a - b) ** 2) for a, b in zip(fe, fl))


def _frequency_masks(h: int, w: int):
    """High/low masks on the *unshifted* spectrum: disk of radius min(H,W)//4
    around (H//2, W//2) — DC actually lives at [0,0], so the 'low' disk covers
    the Nyquist band (reference quirk, kept; losses/loss.py:489-520)."""
    cy, cx = h // 2, w // 2
    yy = jnp.arange(h)[:, None] - cy
    xx = jnp.arange(w)[None, :] - cx
    dist = jnp.sqrt((xx.astype(jnp.float32)) ** 2 + (yy.astype(jnp.float32)) ** 2)
    radius = min(h, w) // 4
    low = (dist <= radius).astype(jnp.float32)
    return 1.0 - low, low


def frequency_loss(
    img_enhanced: jnp.ndarray,
    img_low: jnp.ndarray,
    weight_high: float = 1.0,
    weight_low: float = 0.5,
) -> jnp.ndarray:
    """FFT magnitude-spectrum MSE split by the radial mask
    (reference: losses/loss.py:430-520). NHWC; fft over the spatial axes."""
    h, w = img_enhanced.shape[1], img_enhanced.shape[2]
    mag_e = jnp.abs(jnp.fft.fft2(img_enhanced, axes=(1, 2)))
    mag_l = jnp.abs(jnp.fft.fft2(img_low, axes=(1, 2)))
    high, low = _frequency_masks(h, w)
    high = high[None, :, :, None]
    low = low[None, :, :, None]
    high_loss = jnp.mean((mag_e * high - mag_l * high) ** 2)
    low_loss = jnp.mean((mag_e * low - mag_l * low) ** 2)
    return weight_high * high_loss + weight_low * low_loss


def texture_complexity(img: jnp.ndarray, method: str = "tv") -> jnp.ndarray:
    """Per-sample texture complexity (reference: losses/loss.py:523-583).

    'tv': mean |forward diff| per sample (h + v);
    'edge_density': fraction of Sobel magnitudes above 1.5x their mean.
    Returns [B].
    """
    if method == "tv":
        gh, gv = forward_diff(img)
        return jnp.mean(jnp.abs(gh), axis=(1, 2, 3)) + jnp.mean(jnp.abs(gv), axis=(1, 2, 3))
    if method == "edge_density":
        edge = sobel_edge_map(img)
        thresh = jnp.mean(edge, axis=(1, 2, 3), keepdims=True) * 1.5
        return jnp.mean((edge > thresh).astype(jnp.float32), axis=(1, 2, 3))
    raise ValueError(f"unknown texture method: {method}")
