"""The 7-term unsupervised loss mix as pure jittable functions."""

from retinex_tpu.losses.losses import (  # noqa: F401
    color_loss,
    decoupling_loss,
    exposure_loss,
    frequency_loss,
    perceptual_loss,
    smoothness_loss,
    spatial_consistency_loss,
    texture_complexity,
)
from retinex_tpu.losses.total import LossConfig, LossState, TotalLoss  # noqa: F401
