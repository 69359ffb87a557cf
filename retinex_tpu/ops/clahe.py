"""CLAHE (Contrast-Limited Adaptive Histogram Equalization), TPU-native.

Replaces cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8)).apply(L)
(reference: enhancers/adaptive_params.py:149-152), which the reference runs on
CPU with a GPU->CPU->GPU round trip per image (:191-198). Here the whole
pipeline — RGB->Lab, per-tile histogram/clip/redistribute/CDF LUTs, bilinear
LUT interpolation, Lab->RGB — is one jitted XLA graph over batched NHWC images.

OpenCV algorithm reproduced bit-for-bit on the L channel given identical uint8
input (see tests/test_clahe.py golden tests vs cv2):
1. Pad to a tile-divisible size with BORDER_REFLECT_101 on right/bottom.
2. Per tile: 256-bin histogram; clip bins at clipLimit*tileArea/256 (min 1);
   redistribute the excess evenly, then the residual one count per bin with
   stride max(256/residual, 1); no re-clip after redistribution.
3. LUT[i] = round(cumsum(hist)[i] * 255 / tileArea), saturating cast.
4. Each output pixel bilinearly interpolates the 4 neighbouring tile LUTs with
   tile coordinates tx = x/tileW - 0.5, clamped at the borders.

Implementations:
- `clahe_u8`: pure-jnp reference (one-hot histograms + LUT gathers; fine for
  correctness and small batches, gather-bound on TPU).
- `clahe_u8_fast` (ops/clahe_fast.py): the nibble-decomposed MXU/VPU
  reformulation — the production path (no per-pixel gathers).
- `clahe_lab_rgb_pallas` (ops/clahe_pallas.py): the fully-fused Mosaic/Pallas
  pipeline, reachable via `clahe_lab_rgb(use_pallas=True)` on cell-divisible
  shapes; bit-compatible, speed comparison in BENCH_NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from retinex_tpu.ops.colorspace import lab_u8_to_rgb, rgb_to_lab_u8

HIST_SIZE = 256


def _tile_luts(tiles_u8: jnp.ndarray, clip_limit: float, tile_area: int) -> jnp.ndarray:
    """Compute per-tile OpenCV-CLAHE LUTs.

    tiles_u8: int32 [..., T, tile_area] pixel values in [0,255].
    Returns uint8-valued int32 LUTs [..., T, 256].
    """
    clip = max(int(clip_limit * tile_area / HIST_SIZE), 1)
    # Histogram per tile: VPU-friendly bincount via one-hot accumulate over the
    # 256-bin axis. tile_area is static so XLA unrolls this into dense reductions.
    bins = jnp.arange(HIST_SIZE, dtype=jnp.int32)
    hist = jnp.sum(
        (tiles_u8[..., None] == bins).astype(jnp.int32), axis=-2
    )  # [..., T, 256]

    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)  # [..., T, 1]
    redist = excess // HIST_SIZE
    residual = excess - redist * HIST_SIZE  # in [0, 255]
    hist2 = clipped + redist
    # Residual: one extra count at bins i = 0, step, 2*step, ... for `residual`
    # bins, where step = max(256 // residual, 1)  (OpenCV loop semantics).
    step = jnp.maximum(HIST_SIZE // jnp.maximum(residual, 1), 1)
    idx = bins  # [256]
    gets_one = (idx % step == 0) & (idx // step < residual)
    hist3 = hist2 + gets_one.astype(jnp.int32)

    cdf = jnp.cumsum(hist3, axis=-1)
    lut_scale = float(HIST_SIZE - 1) / float(tile_area)
    lut = jnp.clip(jnp.round(cdf.astype(jnp.float32) * lut_scale), 0, 255).astype(jnp.int32)
    return lut


def _interp_maps(h: int, w: int, tiles_y: int, tiles_x: int, tile_h: int, tile_w: int):
    """Static bilinear interpolation maps between tile LUTs (OpenCV semantics)."""
    ys = (jnp.arange(h, dtype=jnp.float32)) / tile_h - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32)) / tile_w - 0.5
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ya = ys - y0
    xa = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, tiles_y - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, tiles_y - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, tiles_x - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, tiles_x - 1)
    return (y0i, y1i, ya), (x0i, x1i, xa)


@functools.partial(jax.jit, static_argnames=("clip_limit", "tiles_x", "tiles_y"))
def clahe_u8(
    img_u8: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles_x: int = 8,
    tiles_y: int = 8,
) -> jnp.ndarray:
    """OpenCV-parity CLAHE on uint8 single-channel images.

    img_u8: [B, H, W] (or [H, W]) uint8/int32 values in [0,255].
    Returns the same shape, int32 values in [0,255].
    """
    squeeze = img_u8.ndim == 2
    if squeeze:
        img_u8 = img_u8[None]
    img_u8 = img_u8.astype(jnp.int32)
    b, h, w = img_u8.shape

    # BORDER_REFLECT_101 pad right/bottom to tile-divisible size (OpenCV does
    # this whenever H or W is not divisible by the grid).
    pad_h = (-h) % tiles_y
    pad_w = (-w) % tiles_x
    padded = jnp.pad(img_u8, ((0, 0), (0, pad_h), (0, pad_w)), mode="reflect")
    ph, pw = h + pad_h, w + pad_w
    tile_h, tile_w = ph // tiles_y, pw // tiles_x
    tile_area = tile_h * tile_w

    tiles = padded.reshape(b, tiles_y, tile_h, tiles_x, tile_w)
    tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(b, tiles_y * tiles_x, tile_area)
    luts = _tile_luts(tiles, clip_limit, tile_area).reshape(b, tiles_y, tiles_x, HIST_SIZE)

    (y0i, y1i, ya), (x0i, x1i, xa) = _interp_maps(h, w, tiles_y, tiles_x, tile_h, tile_w)

    # Gather the 4 neighbouring LUT values per pixel via flat indices — 4
    # gathers of [h, w] each, never materialising a [b,h,w,256] intermediate.
    v = img_u8  # [b, h, w]
    luts_flat = luts.reshape(b, tiles_y * tiles_x * HIST_SIZE)

    def lut_at(yi, xi):
        flat = (yi[:, None] * tiles_x + xi[None, :]) * HIST_SIZE  # [h, w]
        idx = flat[None, :, :] + v  # [b, h, w]
        return jnp.take_along_axis(luts_flat, idx.reshape(b, -1), axis=-1).reshape(
            b, h, w
        ).astype(jnp.float32)

    l00 = lut_at(y0i, x0i)
    l01 = lut_at(y0i, x1i)
    l10 = lut_at(y1i, x0i)
    l11 = lut_at(y1i, x1i)

    ya2 = ya[None, :, None]
    xa2 = xa[None, None, :]
    top = l00 * (1.0 - xa2) + l01 * xa2
    bot = l10 * (1.0 - xa2) + l11 * xa2
    out = jnp.clip(jnp.round(top * (1.0 - ya2) + bot * ya2), 0, 255).astype(jnp.int32)
    return out[0] if squeeze else out


def clahe_lab_rgb(
    x: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles: int = 8,
    use_pallas: bool | None = None,
    hist_subsample: int = 1,
) -> jnp.ndarray:
    """The reference's full Lab-CLAHE pipeline as one fused graph.

    x: float [0,1] NHWC (or HWC) RGB. Reproduces
    enhancers/adaptive_params.py:121-169: round to uint8, RGB->Lab (8-bit
    scale), CLAHE on L only, merge, Lab->RGB, back to float [0,1].

    use_pallas: None/True route through the Pallas gather pipeline
    (ops/clahe_gather.py — the fastest path, ~1.9x the XLA path) when running
    on TPU with a supported shape, falling back to XLA otherwise; False
    forces the XLA nibble-MXU path. The two agree within +-1/255 on ~1e-5 of
    pixels (FMA/pow lowering differences, PARITY.md).

    hist_subsample=s builds the tile histograms from a within-cell s x s
    decimation of the L plane (clip threshold + CDF scale follow the reduced
    area; identical semantics on both the gather and XLA paths). A speed
    knob — s=1 (default) is the exact OpenCV histogram; s=2 measured ~51 dB
    PSNR vs exact on real photos for the luma mode's equivalent knob. On
    non-cell-divisible shapes the exact fallback runs and the knob is ignored.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if use_pallas is None:
        use_pallas = True
    if use_pallas and jax.devices()[0].platform != "cpu":
        from retinex_tpu.ops.clahe_gather import clahe_lab_rgb_gather, gather_supported

        if gather_supported(x.shape[1], x.shape[2], tiles, tiles):
            out = clahe_lab_rgb_gather(
                x, clip_limit=clip_limit, tiles_x=tiles, tiles_y=tiles,
                hist_subsample=hist_subsample,
            )
            return out[0] if squeeze else out
    xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
    # Quantize the whole Lab tensor to uint8 immediately: it has multiple
    # consumers (CLAHE path + the a/b pass-through), so XLA materializes it —
    # at 1/4 the HBM bytes of f32. (The u8 rounding is the cv2 semantics anyway.)
    lab = jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)
    l_u8 = lab[..., 0]
    # The MXU nibble-decomposed path (bit-compatible, ~60x faster on TPU than
    # gathers); falls back to the gather-based reference for
    # non-cell-divisible shapes.
    from retinex_tpu.ops.clahe_fast import clahe_u8_fast

    l_eq = clahe_u8_fast(
        l_u8, clip_limit=clip_limit, tiles_x=tiles, tiles_y=tiles,
        hist_subsample=hist_subsample,
    )
    # a/b channels pass through in uint8 exactly as cv2.split/merge does.
    lab_eq = jnp.stack(
        [
            l_eq.astype(jnp.float32),
            lab[..., 1].astype(jnp.float32),
            lab[..., 2].astype(jnp.float32),
        ],
        axis=-1,
    )
    rgb = lab_u8_to_rgb(lab_eq)
    out = jnp.round(rgb * 255.0) / 255.0
    return out[0] if squeeze else out
