"""A/B: does the r5 interleave-group composition bias the exact-u8 reading?

Group A = r5 bench variant set (8 variants incl. exact-decimated s2/s4).
Group B = r4-era set (u8, u8_planar, luma s1/2/4, f32 — no exact-decimated).
Run A,B,A,B (2 passes each) in ONE process on the real chip; compare the
u8 / u8_planar medians between compositions.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, "/root/repo")
from bench import H, W, measure_group  # noqa: E402

from retinex_tpu.ops.clahe import clahe_lab_rgb  # noqa: E402
from retinex_tpu.ops.clahe_gather import (  # noqa: E402
    clahe_rgb_u8_gather,
    clahe_rgb_u8_planar_gather,
)
from retinex_tpu.ops.clahe_luma import clahe_luma_rgb_u8_planar  # noqa: E402

batch = 8
rng = np.random.default_rng(0)
inputs_f32 = [
    jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32) * 0.4)
    for _ in range(4)
]
inputs_u8 = [
    jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8) for x in inputs_f32
]
inputs_planar = [jnp.transpose(v, (0, 3, 1, 2)) for v in inputs_u8]
fn_f32 = jax.jit(clahe_lab_rgb)

r4_set = [
    ("u8", clahe_rgb_u8_gather, inputs_u8),
    ("u8_planar", clahe_rgb_u8_planar_gather, inputs_planar),
    ("u8_luma_fast", clahe_luma_rgb_u8_planar, inputs_planar),
    (
        "u8_luma_fast_s2",
        functools.partial(clahe_luma_rgb_u8_planar, hist_subsample=2),
        inputs_planar,
    ),
    (
        "u8_luma_fast_s4",
        functools.partial(clahe_luma_rgb_u8_planar, hist_subsample=4),
        inputs_planar,
    ),
    ("f32", fn_f32, inputs_f32),
]
r5_extra = [
    (
        "u8_planar_s2",
        functools.partial(clahe_rgb_u8_planar_gather, hist_subsample=2),
        inputs_planar,
    ),
    (
        "u8_planar_s4",
        functools.partial(clahe_rgb_u8_planar_gather, hist_subsample=4),
        inputs_planar,
    ),
]
r5_set = r4_set[:2] + r5_extra + r4_set[2:]

for tag, variants in (("A_r5", r5_set), ("B_r4", r4_set), ("A2_r5", r5_set), ("B2_r4", r4_set)):
    res = measure_group(variants, k_big=9, repeats=9)
    for name, (dt, spread) in res.items():
        print(
            f"{tag:6s} {name:18s} {batch/dt:8.1f} fps  spread {spread:.3f}",
            flush=True,
        )
