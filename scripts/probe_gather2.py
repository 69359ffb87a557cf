#!/usr/bin/env python3
"""Probe 2: which exact 2D gather shapes lower in Mosaic."""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

rng = np.random.default_rng(0)


def try_one(name, kernel, args, out_shape, want):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(fn)(*[jnp.asarray(a) for a in args]))
        ok = np.array_equal(out, want)
        print(f"{name}: LOWERED correct={ok}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})")
        return False


# A. take_along_axis along axis 0 (sublanes): table [256, 128], idx [8, 128]
table_a = rng.random((256, 128), dtype=np.float32)
idx_a = rng.integers(0, 256, (8, 128), dtype=np.int32)
want_a = np.take_along_axis(table_a, idx_a, axis=0)


def k_a(t_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], i_ref[:, :], axis=0)


try_one("tala axis0 [256,128]/[8,128]", k_a, [table_a, idx_a],
        jax.ShapeDtypeStruct((8, 128), jnp.float32), want_a)

# B. same-shape tala axis0: table [8,128], idx [8,128] values<8
table_b = rng.random((8, 128), dtype=np.float32)
idx_b = rng.integers(0, 8, (8, 128), dtype=np.int32)
want_b = np.take_along_axis(table_b, idx_b, axis=0)
try_one("tala axis0 [8,128]/[8,128]", k_a, [table_b, idx_b],
        jax.ShapeDtypeStruct((8, 128), jnp.float32), want_b)

# C. tala axis1 same lane count: table [8,128], idx [8,128] values<128
idx_c = rng.integers(0, 128, (8, 128), dtype=np.int32)
want_c = np.take_along_axis(table_b, idx_c, axis=1)


def k_c(t_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], i_ref[:, :], axis=1)


try_one("tala axis1 [8,128]/[8,128]", k_c, [table_b, idx_c],
        jax.ShapeDtypeStruct((8, 128), jnp.float32), want_c)

# D. big realistic: table [256, 128] bcast, idx [512, 128]
idx_d = rng.integers(0, 256, (512, 128), dtype=np.int32)
want_d = np.take_along_axis(table_a, idx_d, axis=0)
try_one("tala axis0 [256,128]/[512,128]", k_a, [table_a, idx_d],
        jax.ShapeDtypeStruct((512, 128), jnp.float32), want_d)

# E. jnp.take axis=0: table [256, 128] rows selected by idx [8,128]? -> 4D; skip.
# F. one-dim gather via jax.lax.gather? try dynamic_gather path: jnp.take with 2D table, 2D idx, axis=0
def k_f(t_ref, i_ref, o_ref):
    # out[s,l] = t[i[s,l], l] expressed via lax.gather? use take_along_axis alt:
    o_ref[:, :] = t_ref[:, :][i_ref[:, :], jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)]


try_one("t[idx, lane_iota] [256,128]/[8,128]", k_f, [table_a, idx_a],
        jax.ShapeDtypeStruct((8, 128), jnp.float32), want_a)

print("done")
