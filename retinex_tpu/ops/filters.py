"""Small spatial filters as XLA-fusable shifted-slice correlations (NHWC).

TPU-native replacements for the reference's OpenCV/scipy filtering:
- Gaussian blur           (reference: enhancers/content_aware.py:50, cv2.GaussianBlur(15,15,0))
- Laplacian               (reference: enhancers/content_aware.py:46, cv2.Laplacian ksize=1)
- Sobel edge magnitude    (reference: losses/loss.py:82-89,127-134)
- Box / uniform filter    (reference: utils/utils.py:226,270-273 scipy variants)
- Forward differences     (reference: losses/loss.py:103-106)

All use BORDER_REFLECT_101 padding (jnp.pad mode='reflect'), matching OpenCV's
default border, and are separable where possible to keep VPU work minimal.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D correlation, NHWC, VALID padding, via SHIFTED SLICES.

    These filters run on 1-3 channel tensors, and a C=1/C=3 NHWC
    `conv_general_dilated` is a pathological TPU shape: the 3x3 Sobel on
    [8,642,642,1] measured 21-22 ms on v5e while the identical arithmetic
    as tap-weighted shifted slices (elementwise FMAs XLA fuses into one
    VPU pass) runs in ~0.3-0.8 ms — a ~50x difference that made the
    smoothness loss 9% of the whole 640px train step (perf_lab r5smooth,
    max rel diff 2.1e-7 = f32 reassociation only; golden suites unchanged).
    Accumulation is plain f32 FMA in fixed tap order — at least as exact as
    the conv's Precision.HIGHEST path this replaces. kernel: [kh, kw].
    """
    kh, kw = kernel.shape
    h, w = x.shape[1], x.shape[2]
    taps = np.asarray(kernel, dtype=np.float32)
    out = None
    for i in range(kh):
        for j in range(kw):
            t = float(taps[i, j])
            if t == 0.0:
                continue
            piece = x[:, i : i + h - kh + 1, j : j + w - kw + 1, :] * t
            out = piece if out is None else out + piece
    return out


def _reflect_pad(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")


def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV getGaussianKernel semantics: sigma<=0 derives sigma from ksize."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) / 2.0
    xs = [i - half for i in range(ksize)]
    vals = [math.exp(-(v * v) / (2.0 * sigma * sigma)) for v in xs]
    s = sum(vals)
    return np.asarray([v / s for v in vals], dtype=np.float32)


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur, NHWC, reflect-101 border."""
    k1 = gaussian_kernel_1d(ksize, sigma)
    p = ksize // 2
    x = _reflect_pad(x, p, 0)
    x = _depthwise_conv(x, k1.reshape(ksize, 1))
    x = _reflect_pad(x, 0, p)
    x = _depthwise_conv(x, k1.reshape(1, ksize))
    return x


_LAPLACIAN_K1 = np.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], dtype=np.float32)
_SOBEL_X = np.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=np.float32)
_SOBEL_Y = np.asarray([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], dtype=np.float32)


def laplacian(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 Laplacian (cv2.Laplacian ksize=1 kernel), reflect-101 border."""
    return _depthwise_conv(_reflect_pad(x, 1, 1), _LAPLACIAN_K1)


def sobel_xy(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gradients (gx, gy), reflect-101 border (matches the reference's
    F.pad(mode='reflect') + conv2d at losses/loss.py:127-131)."""
    xp = _reflect_pad(x, 1, 1)
    return _depthwise_conv(xp, _SOBEL_X), _depthwise_conv(xp, _SOBEL_Y)


def sobel_edge_map(x: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude sqrt(gx^2+gy^2) on the channel-mean gray image.

    Matches EdgeAwareSmoothnessLoss.compute_edge_map (reference: losses/loss.py:110-136):
    gray = mean over channels, then Sobel with reflect padding.
    """
    gray = jnp.mean(x, axis=-1, keepdims=True)
    gx, gy = sobel_xy(gray)
    return jnp.sqrt(gx * gx + gy * gy)


def box_filter(x: jnp.ndarray, ksize: int, normalize: bool = True) -> jnp.ndarray:
    """Separable box filter with zero padding (scipy 'constant' mode parity,
    reference: utils/utils.py:226 uses mode='constant')."""
    k1 = np.full((ksize,), 1.0 / ksize if normalize else 1.0, dtype=np.float32)
    p = ksize // 2
    x = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    x = _depthwise_conv(x, k1.reshape(ksize, 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (0, 0)))
    x = _depthwise_conv(x, k1.reshape(1, ksize))
    return x


def uniform_filter(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """scipy.ndimage.uniform_filter parity (mode='reflect' = edge-inclusive reflect).

    scipy's default 'reflect' duplicates the edge sample ((d c b a | a b c d)),
    which is jnp.pad mode='symmetric', unlike OpenCV's reflect-101.
    (reference: utils/utils.py:270-273 NIQE helper).
    """
    k1 = np.full((ksize,), 1.0 / ksize, dtype=np.float32)
    p_lo = ksize // 2
    p_hi = ksize - 1 - p_lo
    x = jnp.pad(x, ((0, 0), (p_lo, p_hi), (0, 0), (0, 0)), mode="symmetric")
    x = _depthwise_conv(x, k1.reshape(ksize, 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (p_lo, p_hi), (0, 0)), mode="symmetric")
    x = _depthwise_conv(x, k1.reshape(1, ksize))
    return x


def forward_diff(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward differences (grad_h along W, grad_v along H), sign convention
    x[i] - x[i+1] as in the reference (losses/loss.py:103-106). NHWC."""
    grad_h = x[:, :, :-1, :] - x[:, :, 1:, :]
    grad_v = x[:, :-1, :, :] - x[:, 1:, :, :]
    return grad_h, grad_v


def central_gradient(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """torch.gradient parity: central differences in the interior, one-sided at
    the boundaries (reference: enhancers/multi_scale.py:52-54). axis is the
    spatial axis of the NHWC tensor (1=H, 2=W)."""
    n = x.shape[axis]
    sl = [slice(None)] * x.ndim

    def take(a, b):
        s = list(sl)
        s[axis] = slice(a, b)
        return x[tuple(s)]

    interior = (take(2, n) - take(0, n - 2)) * 0.5
    first = take(1, 2) - take(0, 1)
    last = take(n - 1, n) - take(n - 2, n - 1)
    return jnp.concatenate([first, interior, last], axis=axis)
