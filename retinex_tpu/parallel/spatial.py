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
import jax.numpy as jnp
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


def make_spatial_clahe(
    mesh: Mesh,
    mode: str = "clahe",
    clip_limit: float = 2.0,
    tiles: int = 8,
    hist_subsample: int = 1,
    axis_name: str = SPATIAL_AXIS,
):
    """H-sharded classical CLAHE: one huge frame split over the mesh.

    The classical counterpart of `make_spatial_forward` (VERDICT r4 item 7):
    CLAHE's per-tile histograms are H-local, so with each shard holding
    WHOLE tile rows the only cross-shard dependency is the tiny per-tile
    histogram tensor ([b, tiles, tiles, 256] int32 — ~64 KB/frame), moved by
    one `all_gather` over ICI. Everything else — colorspace, the stage-1
    nibble histogram, the OpenCV LUT build (recomputed replicated: cheaper
    than sharding a 256-lane op), the LUT-blend apply — runs on the local
    slab via the SAME stage helpers the single-device XLA path calls
    (ops/clahe_fast._hist_from_cells / _apply_from_cells), so outputs are
    byte-identical to it by construction (tests/test_spatial_clahe.py
    asserts this at 64x64 and a 4K shape). The apply stage selects its
    shard's neighbour-LUT rows and blend parities out of the global tables
    by `axis_index` (bilinear blending reads the tile row above/below —
    satisfied from the gathered tables, no image halo needed).

    mode: "clahe" = the exact-parity Lab pipeline (reference
    enhancers/adaptive_params.py:121-169); "clahe_luma" = the fast
    luma-gain mode (ops/clahe_luma.py XLA formulation, PARITY #20).

    Returns a jitted fn(x) on float [0,1] NHWC with H sharded over the mesh;
    requires mesh_size | tiles (8x8 grid: 2/4/8 devices) and cell-divisible
    H, W (H % (2*tiles*mesh), W % (2*tiles)).
    """
    if mode not in ("clahe", "clahe_luma"):
        raise ValueError(f"unknown spatial CLAHE mode {mode!r}")
    from retinex_tpu.ops.clahe_fast import (
        _apply_from_cells,
        _hist_from_cells,
        _luts_from_hist,
    )
    from retinex_tpu.ops.clahe_luma import _luma_u8
    from retinex_tpu.ops.colorspace import lab_u8_to_rgb, rgb_to_lab_u8

    n = int(mesh.devices.size)
    ncy, ncx = 2 * tiles, 2 * tiles
    if tiles % n != 0:
        raise ValueError(f"mesh size {n} must divide the tile grid ({tiles})")
    ncy_loc = ncy // n

    def local(x):
        # x: [b, h_loc, w, 3] float — this shard's slab of whole tile rows.
        b, h_loc, w, _ = x.shape
        hh, hw = h_loc // ncy_loc, w // ncx
        if mode == "clahe":
            # Pointwise prologue, identical per-pixel math to
            # ops/clahe.clahe_lab_rgb's XLA route.
            xq = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
            lab = jnp.clip(jnp.round(rgb_to_lab_u8(xq)), 0, 255).astype(jnp.uint8)
            plane = lab[..., 0]
        else:
            # ops/clahe_luma.clahe_luma_rgb XLA route's prologue.
            xp = jnp.clip(jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0), 0, 255).astype(
                jnp.uint8
            ).transpose(0, 3, 1, 2)
            plane = _luma_u8(xp)

        v5 = plane.astype(jnp.int32).reshape(b, ncy_loc, hh, ncx, hw)
        hist_loc, area = _hist_from_cells(v5, hist_subsample)
        # The one collective: concatenate every shard's tile-row histograms
        # into the global [b, tiles, tiles, 256] (int32 — exact).
        hist = jax.lax.all_gather(hist_loc, axis_name, axis=1, tiled=True)
        luts = _luts_from_hist(hist, clip_limit, area)
        row0 = jax.lax.axis_index(axis_name) * ncy_loc
        eq = _apply_from_cells(v5, luts, tiles, tiles, row0=row0)  # [b,h_loc,w]

        if mode == "clahe":
            lab_eq = jnp.stack(
                [
                    eq.astype(jnp.float32),
                    lab[..., 1].astype(jnp.float32),
                    lab[..., 2].astype(jnp.float32),
                ],
                axis=-1,
            )
            return jnp.round(lab_u8_to_rgb(lab_eq) * 255.0) / 255.0
        gain = (eq.astype(jnp.float32) + 1.0) / (plane.astype(jnp.float32) + 1.0)
        o = jnp.round(jnp.clip(xp.astype(jnp.float32) * gain[:, None], 0.0, 255.0))
        return o.astype(jnp.uint8).transpose(0, 2, 3, 1).astype(jnp.float32) / 255.0

    spec = P(None, axis_name, None, None)
    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False
    )

    def fn(x):
        h, w = x.shape[1], x.shape[2]
        # h % ncy ensures whole half-tile cells AND whole cell rows per shard
        # (n | tiles | ncy, so each h/n slab is exactly ncy_loc cell rows).
        if h % ncy or w % ncx:
            raise ValueError(
                f"spatial CLAHE needs H % {ncy} == 0 and W % {ncx} == 0; "
                f"got {(h, w)} (tiles={tiles}, mesh={n})"
            )
        return sharded(x)

    return jax.jit(fn)
