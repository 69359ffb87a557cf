"""Observability + visualization utilities."""

from retinex_tpu.utils.logging import MetricLogger, save_loss_curves, save_results_to_csv  # noqa: F401
from retinex_tpu.utils.viz import create_comparison, create_gif, save_image, visualize_results  # noqa: F401
