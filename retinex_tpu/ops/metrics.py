"""Image-quality metrics as jittable jnp functions (NHWC, float [0,1]).

TPU-native re-provision of the reference metric library (utils/utils.py:95-333):
brightness/contrast/entropy, PSNR, per-channel 11x11-box SSIM, simplified NIQE,
saturation, naturalness. The reference computes these in numpy/scipy on host;
here they are fused XLA graphs usable inside eval loops and parity gates.
"""

from __future__ import annotations

import jax.numpy as jnp

from retinex_tpu.ops.colorspace import saturation_map
from retinex_tpu.ops.filters import box_filter, uniform_filter


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB, max_pixel=1.0 (reference: utils/utils.py:186-202)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return jnp.where(mse < 1e-10, 100.0, 20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((img1 - img2) ** 2)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-channel SSIM with an 11x11 normalized box window and zero-padded
    borders, averaged over channels (reference: utils/utils.py:205-247 uses
    np.ones((11,11))/121 with scipy convolve mode='constant').

    img*: [H, W, C] or [B, H, W, C].
    """
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    c1 = 0.01**2
    c2 = 0.03**2
    # NOTE(reference quirk): the reference normalizes by 121 instead of 11*11=121
    # — these agree; kernel is a box mean.
    mu1 = box_filter(img1, 11)
    mu2 = box_filter(img2, 11)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = box_filter(img1 * img1, 11) - mu1_sq
    sigma2_sq = box_filter(img2 * img2, 11) - mu2_sq
    sigma12 = box_filter(img1 * img2, 11) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def entropy(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Shannon entropy of the intensity histogram over [0,1]
    (reference: utils/utils.py:129-137)."""
    flat = img.reshape(-1)
    edges = jnp.linspace(0.0, 1.0, bins + 1)
    # np.histogram semantics: right-inclusive last bin.
    idx = jnp.clip(jnp.searchsorted(edges, flat, side="right") - 1, 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    plogp = jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0)
    return -jnp.sum(plogp)


def niqe_simplified(img: jnp.ndarray) -> jnp.ndarray:
    """The reference's simplified NIQE: local 7x7 mean/sigma on Rec.601 gray,
    score = mean(sigma)/(std(mu)+1e-8) (reference: utils/utils.py:250-278).

    img: [H, W, C] or [H, W] float [0,1].
    """
    if img.ndim == 3:
        gray = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    else:
        gray = img
    g = gray[None, :, :, None]
    mu = uniform_filter(g, 7)
    var = uniform_filter(g * g, 7) - mu * mu
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    return jnp.mean(sigma) / (jnp.std(mu) + 1e-8)


def saturation(img: jnp.ndarray) -> jnp.ndarray:
    """Mean HSV-style saturation (reference: utils/utils.py:281-303)."""
    return jnp.mean(saturation_map(img))


def naturalness(img: jnp.ndarray) -> jnp.ndarray:
    """Composite naturalness score (reference: utils/utils.py:306-333):
    0.3*color-balance + 0.4*contrast-score + 0.3*brightness-score."""
    chan_means = jnp.stack([jnp.mean(img[..., i]) for i in range(3)])
    color_balance = 1.0 - jnp.std(chan_means)
    contrast = jnp.std(img)
    contrast_score = jnp.clip(1.0 - jnp.abs(contrast - 0.15) / 0.15, 0.0, 1.0)
    brightness = jnp.mean(img)
    brightness_score = jnp.clip(1.0 - jnp.abs(brightness - 0.5) / 0.5, 0.0, 1.0)
    return 0.3 * color_balance + 0.4 * contrast_score + 0.3 * brightness_score


def calculate_metrics(img_enhanced: jnp.ndarray, img_reference: jnp.ndarray | None = None) -> dict:
    """Dict-of-scalars metric bundle mirroring utils/utils.py:95-180."""
    m = {
        "mean_brightness": jnp.mean(img_enhanced),
        "contrast": jnp.std(img_enhanced),
        "entropy": entropy(img_enhanced),
        "niqe": niqe_simplified(img_enhanced),
        "saturation": saturation(img_enhanced),
        "naturalness": naturalness(img_enhanced),
    }
    if img_reference is not None:
        m["psnr"] = psnr(img_enhanced, img_reference)
        m["ssim"] = ssim(img_enhanced, img_reference)
        m["mse"] = mse(img_enhanced, img_reference)
    return m
