"""Flax NHWC model family: FAM, residual blocks, ASPP, IENet, MultiScaleUPRetinex."""

from retinex_tpu.models.layers import (  # noqa: F401
    ASPPModule,
    EnhancedFAM,
    PreActResBlock,
    ResBlock,
    UpBlock,
)
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex, ResidualIENet, UPRetinex  # noqa: F401
