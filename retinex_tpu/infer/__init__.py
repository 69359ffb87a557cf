"""Inference: trained-model predict + classical-assisted enhance pipelines."""

from retinex_tpu.infer.adaptive_params import AdaptiveParameterAdjuster  # noqa: F401
from retinex_tpu.infer.enhance import (  # noqa: F401
    ContentAwareEnhancer,
    MultiScaleEnhancer,
    enhance_batch_images,
    enhance_single_image,
)
from retinex_tpu.infer.predict import predict_batch, predict_single_image  # noqa: F401
