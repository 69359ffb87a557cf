"""Mesh/sharding helpers: data-parallel training + spatial (H-axis) inference."""

from retinex_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    replicate,
    shard_batch,
    shard_batch_sharding,
)
from retinex_tpu.parallel.spatial import (  # noqa: F401
    make_spatial_forward,
    spatial_sharding,
)
