"""Spatial (height-axis) sharding: one huge frame across the whole mesh.

Batch parallelism (parallel/mesh.py) is the right scale-out for directory
workloads, but a single 8K/16K frame at batch 1 leaves N-1 chips idle. This
module shards the IMAGE HEIGHT over the mesh instead: every conv/pool in the
network is a local-stencil op, so GSPMD partitions each one with a halo
exchange (a ring `ppermute` of the 1-2 boundary rows over ICI) and the whole
forward — IE-net U-path, multi-scale towers, fusion — runs with each chip
holding an H/N slab. Weights (6.5M params) replicate.

The reference has no analog (single-GPU, models/model.py); this is TPU-mesh
headroom. Accuracy: bit-exact modulo f32 reduction order — the only
cross-slab ops are conv halos (exact) and the FAM/ASPP global means (psum
reassociation), verified to ~1e-7 by tests/test_spatial_sharding.py.

Constraints:
- H must be divisible by 8 * mesh_size (the encoder downsamples 8x; keeping
  every stage's sharded axis divisible avoids GSPMD padding — which the
  letterbox /32 alignment already guarantees for meshes up to 4, and /64 for
  8). `spatial_forward` asserts this.
- Stride-1 max pools must not use a -inf accumulator: XLA's SPMD partitioner
  leaks reduce_window init/padding values into boundary windows when the
  pooled operand is spatially sharded inside a multi-branch fan-out (repro'd
  on jax 0.9.0: NaNs). models/layers.py:max_pool_nonneg (init 0, exact for
  the model's non-negative inputs) is the guard; keep new pools on it.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_AXIS = "data"  # reuse the 1-D mesh; the axis name is arbitrary


def spatial_sharding(mesh: Mesh, axis_name: str = SPATIAL_AXIS) -> NamedSharding:
    """NHWC sharding that splits the height axis across the mesh."""
    return NamedSharding(mesh, P(None, axis_name, None, None))


def make_spatial_forward(model, mesh: Mesh, axis_name: str = SPATIAL_AXIS):
    """Jitted full-model forward with the input sharded over H.

    Returns fn(variables, x_nhwc) -> (enhanced, reflectance, illumination),
    all three outputs left sharded over H (callers that need host arrays
    fetch them; callers that post-process on device keep the sharding).
    """
    in_shard = spatial_sharding(mesh, axis_name)
    repl = NamedSharding(mesh, P())

    def fwd(variables, x):
        n_shards = mesh.devices.size
        if x.shape[1] % (8 * n_shards) != 0:
            raise ValueError(
                f"spatial forward needs H divisible by 8*mesh ({8 * n_shards}); got H={x.shape[1]}"
            )
        return model.apply(variables, x, train=False)

    return jax.jit(
        fwd,
        in_shardings=(repl, in_shard),
        out_shardings=(in_shard, in_shard, in_shard),
    )
