"""Classical SSR/MSR/MSRCR log-domain Retinex, TPU-first.

The reference contains no classical Retinex implementation (SURVEY.md §0); this
is the BASELINE.json extension target: "simple_enhance's SSR/MSR multi-scale
Gaussian blurs, log-domain illumination/reflectance arithmetic" as fused XLA
graphs over batched NHWC images.

TPU design notes:
- Large-sigma Gaussian blurs (the MSR scales are classically 15/80/250) are
  approximated by 3 iterated box filters (Wells '86 / Kovesi '10 widths): each
  box is two cumulative sums + two subtracts per axis, O(1) work per pixel
  independent of sigma, and XLA lowers cumsum to a log-depth scan — far
  cheaper on the VPU than a length-1501 separable conv.
- Everything is static-shape and fuses into one jit region; percentile
  normalization uses a 512-bin histogram CDF instead of a sort.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_EPS = 1.0 / 255.0


def _box_blur_axis(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Mean filter of width 2*radius+1 along one spatial axis via cumsum,
    edge-replicated padding (standard Retinex border handling)."""
    if radius <= 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius + 1, radius)
    xp = jnp.pad(x, pad, mode="edge")
    c = jnp.cumsum(xp, axis=axis)
    n = x.shape[axis]
    w = 2 * radius + 1
    hi = jax.lax.slice_in_dim(c, w, w + n, axis=axis)
    lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
    return (hi - lo) / w


def _boxes_for_gauss(sigma: float, n: int = 3) -> list[int]:
    """Kovesi's box widths: n iterated boxes whose composition approximates a
    Gaussian of the given sigma. Returns per-pass radii."""
    w_ideal = math.sqrt((12.0 * sigma * sigma / n) + 1.0)
    wl = int(math.floor(w_ideal))
    if wl % 2 == 0:
        wl -= 1
    wu = wl + 2
    m_ideal = (12.0 * sigma * sigma - n * wl * wl - 4 * n * wl - 3 * n) / (-4.0 * wl - 4.0)
    m = int(round(m_ideal))
    sizes = [wl if i < m else wu for i in range(n)]
    return [(s - 1) // 2 for s in sizes]


def gaussian_blur_approx(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """3-pass box approximation of a large-sigma Gaussian (NHWC)."""
    for r in _boxes_for_gauss(sigma):
        x = _box_blur_axis(x, r, axis=1)
        x = _box_blur_axis(x, r, axis=2)
    return x


def single_scale_retinex(x: jnp.ndarray, sigma: float, eps: float = _EPS) -> jnp.ndarray:
    """SSR: log(x) - log(G_sigma * x), per channel. x: NHWC float [0,1]."""
    return jnp.log(x + eps) - jnp.log(gaussian_blur_approx(x, sigma) + eps)


def multi_scale_retinex(
    x: jnp.ndarray,
    sigmas: tuple[float, ...] = (15.0, 80.0, 250.0),
    weights: tuple[float, ...] | None = None,
    eps: float = _EPS,
) -> jnp.ndarray:
    """MSR: weighted sum of SSR responses. One log(x) is shared across scales."""
    if weights is None:
        weights = tuple(1.0 / len(sigmas) for _ in sigmas)
    log_x = jnp.log(x + eps)
    out = jnp.zeros_like(x)
    for s, w in zip(sigmas, weights):
        out = out + w * (log_x - jnp.log(gaussian_blur_approx(x, s) + eps))
    return out


def color_restoration(x: jnp.ndarray, alpha: float = 125.0, beta: float = 46.0, eps: float = _EPS) -> jnp.ndarray:
    """MSRCR color-restoration factor C = beta*(log(alpha*I_c) - log(sum_c I_c))."""
    s = jnp.sum(x, axis=-1, keepdims=True)
    return beta * (jnp.log(alpha * x + eps) - jnp.log(s + eps))


def _quantiles_from_histogram(x: jnp.ndarray, lo_frac: float, hi_frac: float, bins: int = 512):
    """Per-image (lo, hi) quantiles of a [B, ...] tensor via a histogram CDF —
    avoids a full sort on TPU. Returns ([B], [B]) in the data's value range."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    mn = jnp.min(flat, axis=1, keepdims=True)
    mx = jnp.max(flat, axis=1, keepdims=True)
    scale = (mx - mn) + 1e-12
    idx = jnp.clip(((flat - mn) / scale * bins).astype(jnp.int32), 0, bins - 1)
    one = jnp.ones_like(flat, dtype=jnp.float32)
    hist = jnp.zeros((b, bins), jnp.float32)
    hist = jax.vmap(lambda h, i, o: h.at[i].add(o))(hist, idx, one)
    cdf = jnp.cumsum(hist, axis=1) / flat.shape[1]
    edges = jnp.arange(bins, dtype=jnp.float32) / bins  # bin left edges in [0,1)

    def q(frac):
        # First bin whose CDF reaches frac.
        reached = cdf >= frac
        pos = jnp.argmax(reached, axis=1)
        return mn[:, 0] + (edges[pos] + 0.5 / bins) * scale[:, 0]

    return q(lo_frac), q(hi_frac)


def percentile_stretch(x: jnp.ndarray, clip: float = 0.01) -> jnp.ndarray:
    """Per-image linear stretch clipping `clip` mass at each tail ("simplest
    color balance"); maps [q_lo, q_hi] -> [0, 1]."""
    lo, hi = _quantiles_from_histogram(x, clip, 1.0 - clip)
    lo = lo.reshape(-1, *([1] * (x.ndim - 1)))
    hi = hi.reshape(-1, *([1] * (x.ndim - 1)))
    return jnp.clip((x - lo) / (hi - lo + 1e-8), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("sigmas", "mode", "clip"))
def msr_enhance(
    x: jnp.ndarray,
    sigmas: tuple[float, ...] = (15.0, 80.0, 250.0),
    mode: str = "msr",
    clip: float = 0.01,
) -> jnp.ndarray:
    """Fused classical enhance: MSR (optionally with MSRCR color restoration)
    + percentile stretch back to [0,1]. x: NHWC float [0,1]."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    r = multi_scale_retinex(x, sigmas)
    if mode == "msrcr":
        r = r * color_restoration(x)
    out = percentile_stretch(r, clip)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("sigma", "clip"))
def ssr_enhance(x: jnp.ndarray, sigma: float = 80.0, clip: float = 0.01) -> jnp.ndarray:
    """Fused single-scale Retinex enhance + percentile stretch."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    out = percentile_stretch(single_scale_retinex(x, sigma), clip)
    return out[0] if squeeze else out
