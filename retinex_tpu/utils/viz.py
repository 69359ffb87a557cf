"""Visualization: 3-panel result figures, side-by-side comparisons, GIFs.

Mirrors utils/utils.py:12-69 (visualize_results), predictors/predict.py:101-140
(create_comparison) and utils/utils.py:336-363 (create_gif) on NHWC arrays.
"""

from __future__ import annotations

import numpy as np


def _to_hwc(img) -> np.ndarray:
    """Accept [H,W,C], [1,H,W,C] jnp/np arrays in [0,1]; return clipped HWC."""
    arr = np.asarray(img)
    if arr.ndim == 4:
        arr = arr[0]
    return np.clip(arr, 0.0, 1.0)


def _write_png(arr_u8: np.ndarray, save_path: str):
    """Write [H,W,3] uint8 as PNG: native libpng encoder when available
    (level-1 SUB — ~6x PIL's encode speed at +4% size, data/native_loader.py),
    PIL otherwise. Pixels are identical either way (PNG is lossless)."""
    if save_path.lower().endswith(".png"):
        from retinex_tpu.data.native_loader import encode_png

        if encode_png(arr_u8, save_path):
            return
    from PIL import Image

    Image.fromarray(arr_u8).save(save_path)


def save_image(img, save_path: str):
    """Save a [0,1] float image ([H,W,C], [H,W,1] or batch-1 variants) as PNG;
    single-channel images are replicated to RGB (reference:
    predictors/predict.py:65-99)."""
    arr = _to_hwc(img)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    _write_png((arr * 255).astype(np.uint8), save_path)


def create_comparison(img_low, img_enhanced, illu_map=None, save_path: str | None = None):
    """Horizontal [input | enhanced | (illumination)] strip as uint8 RGB;
    saves if save_path is given, returns the array."""
    panels = [_to_hwc(img_low), _to_hwc(img_enhanced)]
    if illu_map is not None:
        illu = _to_hwc(illu_map)
        if illu.shape[-1] != 1:
            illu = illu.mean(axis=-1, keepdims=True)
        panels.append(np.repeat(illu, 3, axis=-1))
    strip = (np.concatenate(panels, axis=1) * 255).astype(np.uint8)
    if save_path:
        _write_png(strip, save_path)
    return strip


def visualize_results(img_low, img_enhanced, illu_map, save_path: str | None = None):
    """3-panel matplotlib figure: input / enhanced / illumination-gray
    (reference: utils/utils.py:12-69)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    low = _to_hwc(img_low)
    enh = _to_hwc(img_enhanced)
    illu = _to_hwc(illu_map)
    illu_gray = illu.mean(axis=-1) if illu.ndim == 3 else illu

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(low)
    axes[0].set_title("Input (Low-light)", fontsize=14)
    axes[1].imshow(enh)
    axes[1].set_title("Enhanced", fontsize=14)
    axes[2].imshow(illu_gray, cmap="gray")
    axes[2].set_title("Illumination Map", fontsize=14)
    for ax in axes:
        ax.axis("off")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def create_gif(image_paths: list[str], output_path: str, duration: int = 500):
    """Animated GIF from image files (reference: utils/utils.py:336-363)."""
    from PIL import Image

    images = [Image.open(p) for p in image_paths]
    images[0].save(
        output_path, save_all=True, append_images=images[1:], duration=duration, loop=0
    )
