#!/usr/bin/env python3
"""Micro-bisection of the FAM tail's elementwise ops (the 17 ms mystery).

Each candidate pathology measured in isolation on [2,544,960,128] bf16.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

B, Hp, Wp, C = 2, 544, 960, 128


def _timed(fn, inputs, k):
    start = time.perf_counter()
    out = None
    for i in range(k):
        out = fn(inputs[i % len(inputs)])
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    return time.perf_counter() - start


def measure(name, fn, inputs, k_big=9, repeats=3):
    _timed(fn, inputs, 1)
    t1 = min(_timed(fn, inputs, 1) for _ in range(repeats))
    t2 = min(_timed(fn, inputs, k_big) for _ in range(repeats))
    dt = max((t2 - t1) / (k_big - 1), 1e-9)
    print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((B, Hp, Wp, C)) * 0.3, jnp.bfloat16) for _ in range(3)]
    sa_k = jnp.asarray(rng.standard_normal((5, 5, 8, 4)) * 0.1, jnp.float32)

    @jax.jit
    def copy_stream(v):
        return v * jnp.bfloat16(1.0001)

    @jax.jit
    def gap_full(v):
        return v.mean(axis=(1, 2))

    @jax.jit
    def ca_mul(v):
        ca = jax.nn.sigmoid(v.mean(axis=(1, 2), keepdims=True))
        return v * ca

    @jax.jit
    def blocks_stats(v):
        blocks = v.reshape(B, Hp, Wp, 4, 32)
        return blocks.mean(axis=-1), blocks.max(axis=-1)

    @jax.jit
    def stack_path(v):
        blocks = v.reshape(B, Hp, Wp, 4, 32)
        a, m = blocks.mean(axis=-1), blocks.max(axis=-1)
        return jnp.stack([a, m], axis=-1).reshape(B, Hp, Wp, 8)

    @jax.jit
    def sa_conv_only(v):
        sa_in = stack_path(v)
        out = jax.lax.conv_general_dilated(
            sa_in, sa_k.astype(sa_in.dtype), (1, 1), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.sigmoid(out)

    @jax.jit
    def sa_mul(v):
        sa = jax.nn.sigmoid(v[..., :4])  # stand-in [*, 4]
        blocks = v.reshape(B, Hp, Wp, 4, 32)
        return (blocks * sa[..., None]).reshape(B, Hp, Wp, 128)

    @jax.jit
    def sa_mul_repeat(v):
        sa = jax.nn.sigmoid(v[..., :4])
        return v * jnp.repeat(sa, 32, axis=-1)

    measure("copy stream (roofline ref)", copy_stream, xs)
    measure("gap full", gap_full, xs)
    measure("ca mul (gap+sigmoid+mul)", ca_mul, xs)
    measure("blocks mean+max [*,4]", blocks_stats, xs)
    measure("stack->[*,8]", stack_path, xs)
    measure("sa conv 5x5 8->4 (+stats)", sa_conv_only, xs)
    measure("sa mul blocks*[*,4,1]", sa_mul, xs)
    measure("sa mul repeat lanes", sa_mul_repeat, xs)


if __name__ == "__main__":
    main()
