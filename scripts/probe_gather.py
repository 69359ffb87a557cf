#!/usr/bin/env python3
"""Probe: which dynamic-gather forms lower in Mosaic/Pallas on this TPU.

If any per-lane dynamic gather works, the CLAHE apply stage collapses from
~1088 MACs/pixel of one-hot algebra to ~4 table lookups/pixel.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

table_np = np.arange(256, dtype=np.float32) * 2.0
idx_np = np.random.default_rng(0).integers(0, 256, (8, 128), dtype=np.int32)


def try_one(name, kernel, *args, out_shape):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(fn)(*args)
        out = np.asarray(out)
        want = table_np[idx_np]
        ok = np.allclose(out, want)
        print(f"{name}: LOWERED, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})")


# 1. jnp.take along a 1D table (table as [1, 256] to stay 2D)
def k_take(table_ref, idx_ref, out_ref):
    t = table_ref[0, :]  # [256]
    out_ref[:, :] = jnp.take(t, idx_ref[:, :], axis=0)


try_one(
    "jnp.take(1d_table, idx2d)",
    k_take,
    jnp.asarray(table_np)[None],
    jnp.asarray(idx_np),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)


# 2. take_along_axis on the lane axis: table [8, 256] rows, idx [8, 128]
def k_tala(table_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(table_ref[:, :], idx_ref[:, :], axis=1)


try_one(
    "take_along_axis(lane axis)",
    k_tala,
    jnp.broadcast_to(jnp.asarray(table_np)[None], (8, 256)),
    jnp.asarray(idx_np),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)


# 3. indexing a ref with a vector (sugar for gather)
def k_index(table_ref, idx_ref, out_ref):
    t = table_ref[:, :]
    out_ref[:, :] = t[0, idx_ref[:, :]]


try_one(
    "ref[0, idx2d]",
    k_index,
    jnp.asarray(table_np)[None],
    jnp.asarray(idx_np),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)

print("done")
