"""Mesh/sharding helpers for data-parallel training over ICI."""

from retinex_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    replicate,
    shard_batch,
    shard_batch_sharding,
)
