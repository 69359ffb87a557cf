#!/usr/bin/env python3
"""Probe 3: throughput of same-shape take_along_axis in Mosaic (both axes).

Kernel does a 256-entry LUT lookup per element (2 same-shape gathers + select)
over a large block; compare against a pure copy kernel to get the per-element
gather cost.
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

rng = np.random.default_rng(0)
NB, S, L = 2048, 64, 128  # ~16.7M elements, the 1080p batch-8 L-channel scale


def timed(fn, inputs, k):
    t0 = time.perf_counter()
    out = None
    for i in range(k):
        out = fn(*inputs[i % len(inputs)])
    float(jnp.sum(out[:, :8, :8].astype(jnp.float32)))
    return time.perf_counter() - t0


def slope(fn, inputs, k=9, rep=3):
    timed(fn, inputs, 1)
    t1 = min(timed(fn, inputs, 1) for _ in range(rep))
    t2 = min(timed(fn, inputs, k) for _ in range(rep))
    return max((t2 - t1) / (k - 1), 1e-9)


idxs = [jnp.asarray(rng.integers(0, 256, (NB, S, L), dtype=np.int32)) for _ in range(3)]
tables = [jnp.asarray(rng.random((NB, 2, S, L), dtype=np.float32)) for _ in range(3)]


def k_copy(i_ref, t_ref, o_ref):
    o_ref[:, :] = i_ref[:, :].astype(jnp.float32) + t_ref[0, :, :]


def k_lane_gather(i_ref, t_ref, o_ref):
    # table along lanes: t[0] = entries 0..127, t[1] = 128..255 (rows identical)
    v = i_ref[:, :]
    lo = jnp.take_along_axis(t_ref[0], jnp.where(v < 128, v, 0), axis=1)
    hi = jnp.take_along_axis(t_ref[1], jnp.where(v >= 128, v - 128, 0), axis=1)
    o_ref[:, :] = jnp.where(v < 128, lo, hi)


def k_lane_gather4(i_ref, t_ref, o_ref):
    v = i_ref[:, :]
    acc = jnp.zeros_like(t_ref[0])
    for _ in range(4):  # 4 LUT lookups like the CLAHE 4-neighbour blend
        lo = jnp.take_along_axis(t_ref[0], jnp.where(v < 128, v, 0), axis=1)
        hi = jnp.take_along_axis(t_ref[1], jnp.where(v >= 128, v - 128, 0), axis=1)
        acc = acc + jnp.where(v < 128, lo, hi)
        v = (v + 1) & 255
    o_ref[:, :] = acc


def k_sub_gather(i_ref, t_ref, o_ref):
    # table along sublanes: same-shape axis0 gather, 64 rows -> needs v<64:
    v = i_ref[:, :] & 63
    o_ref[:, :] = jnp.take_along_axis(t_ref[0], v, axis=0)


def make(kernel):
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((None, S, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 2, S, L), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, S, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NB, S, L), jnp.float32),
        )
    )


inputs = list(zip(idxs, tables))
n = NB * S * L
for name, kern in [
    ("copy+add", k_copy),
    ("lut256_lane(2 gathers)", k_lane_gather),
    ("lut256_lane x4", k_lane_gather4),
    ("sub_gather(1 gather)", k_sub_gather),
]:
    try:
        fn = make(kern)
        dt = slope(fn, inputs)
        print(f"{name:26s} {dt * 1e3:7.2f} ms  ({dt / n * 1e12:6.2f} ps/elem)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:120]}", flush=True)

# correctness of the 256-LUT lane form
fn = make(k_lane_gather)
out = np.asarray(fn(idxs[0], tables[0]))
t = np.asarray(tables[0])
v = np.asarray(idxs[0])
want = np.where(v < 128,
                np.take_along_axis(t[:, 0], np.where(v < 128, v, 0), axis=2),
                np.take_along_axis(t[:, 1], np.where(v >= 128, v - 128, 0) , axis=2))
print("lane 256-LUT correct:", np.allclose(out, want))
