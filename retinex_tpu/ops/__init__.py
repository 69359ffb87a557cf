"""TPU-first image ops: colorspace, filters, resize/letterbox, CLAHE, classical Retinex, metrics."""

from retinex_tpu.ops import colorspace, filters, resize, letterbox  # noqa: F401
