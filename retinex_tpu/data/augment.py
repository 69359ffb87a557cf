"""Device-side batched augmentation as one jitted function.

TPU-first redesign of the reference's per-sample CPU augmentation
(datasets/dataset.py:101-183): instead of mutating each image in a DataLoader
worker process, the whole batch is augmented on device with per-sample
jax.random draws, fused by XLA into a single pass over HBM.

Basic augs (reference :101-114): H/V flips and 90-degree rotations (square
images only for rot90 — the loader pads to a square canvas).
Advanced augs (reference :122-183): gamma 0.6-1.8, contrast 0.8-1.2,
brightness +-0.1, Gaussian noise sigma in [0.01,0.03] with p=0.7, saturation
0.8-1.2 via a Rec.601 gray mix, and the reference's "hue shift" (which is
actually a +-0.05 additive shift on all channels — quirk kept).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from retinex_tpu.ops.colorspace import rgb_to_luma


def _per_sample(shape_b, key, lo, hi):
    return jax.random.uniform(key, (shape_b, 1, 1, 1), minval=lo, maxval=hi)


def _mask(shape_b, key, p):
    """Per-sample boolean gate with probability p (matches the reference's
    `random.random() > 0.5` style gates)."""
    return (jax.random.uniform(key, (shape_b, 1, 1, 1)) < p).astype(jnp.float32)


def sample_advanced_params(key: jax.Array, b: int) -> dict[str, jnp.ndarray]:
    """Per-sample gates and magnitudes for the advanced augmentations.

    Every gate is drawn from a key distinct from its magnitude's key, matching
    the reference's independent `random.random()` / `random.uniform()` draws
    (datasets/dataset.py:133-183). Exposed separately so tests can assert the
    joint gate/magnitude distribution (a past bug correlated them, silently
    restricting contrast to [0.8,1.0) and brightness to negative shifts).
    """
    keys = jax.random.split(key, 16)
    return {
        "g_on": _mask(b, keys[4], 0.5),
        "gamma": _per_sample(b, keys[5], 0.6, 1.8),
        "c_on": _mask(b, keys[6], 0.5),
        "contrast": _per_sample(b, keys[12], 0.8, 1.2),
        "br_on": _mask(b, keys[7], 0.5),
        "brightness": _per_sample(b, keys[13], -0.1, 0.1),
        "n_on": _mask(b, keys[8], 0.7),
        "sigma": _per_sample(b, keys[9], 0.01, 0.03),
        "noise_key": keys[10],
        "s_on": _mask(b, keys[11], 0.5),
        "saturation": _per_sample(b, keys[14], 0.8, 1.2),
        "h_on": _mask(b, keys[15], 0.5),
        "hue": _per_sample(b, jax.random.fold_in(keys[15], 2), -0.05, 0.05),
    }


@functools.partial(jax.jit, static_argnames=("basic", "advanced"))
def augment_batch(
    key: jax.Array, batch: jnp.ndarray, basic: bool = True, advanced: bool = False
) -> jnp.ndarray:
    """Augment an NHWC batch (uint8 or float [0,1]); returns float [0,1].

    Accepting uint8 lets the trainer ship quarter-size host->device transfers
    and normalize on device."""
    b = batch.shape[0]
    keys = jax.random.split(key, 16)
    if batch.dtype == jnp.uint8:
        x = batch.astype(jnp.float32) / 255.0
    else:
        x = batch

    if basic:
        hflip = jax.random.uniform(keys[0], (b, 1, 1, 1)) < 0.5
        x = jnp.where(hflip, jnp.flip(x, axis=2), x)
        vflip = jax.random.uniform(keys[1], (b, 1, 1, 1)) < 0.5
        x = jnp.where(vflip, jnp.flip(x, axis=1), x)

        if x.shape[1] == x.shape[2]:  # rot90 requires a square canvas
            do_rot = jax.random.uniform(keys[2], (b,)) < 0.5
            k = jax.random.randint(keys[3], (b,), 1, 4)  # 1..3 quarter-turns
            r1 = jnp.rot90(x, k=1, axes=(1, 2))
            r2 = jnp.rot90(x, k=2, axes=(1, 2))
            r3 = jnp.rot90(x, k=3, axes=(1, 2))
            rotated = jnp.where(
                (k == 1)[:, None, None, None],
                r1,
                jnp.where((k == 2)[:, None, None, None], r2, r3),
            )
            x = jnp.where(do_rot[:, None, None, None], rotated, x)

    if advanced:
        p = sample_advanced_params(key, b)
        # 1. gamma
        x_g = jnp.power(jnp.maximum(x, 1e-8), p["gamma"])
        x = p["g_on"] * x_g + (1.0 - p["g_on"]) * x
        # 2. contrast around the per-sample mean
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        x_c = jnp.clip((x - mean) * p["contrast"] + mean, 0.0, 1.0)
        x = p["c_on"] * x_c + (1.0 - p["c_on"]) * x
        # 3. brightness
        x = jnp.clip(x + p["br_on"] * p["brightness"], 0.0, 1.0)
        # 4. Gaussian noise, p=0.7
        noise = jax.random.normal(p["noise_key"], x.shape) * p["sigma"]
        x = jnp.clip(x + p["n_on"] * noise, 0.0, 1.0)
        # 5. saturation via Rec.601 gray mix
        gray = rgb_to_luma(x)
        x_s = jnp.clip(gray + p["saturation"] * (x - gray), 0.0, 1.0)
        x = p["s_on"] * x_s + (1.0 - p["s_on"]) * x
        # 6. "hue" shift (reference quirk: additive shift on all channels,
        #    datasets/dataset.py:177-180)
        x = jnp.clip(x + p["h_on"] * p["hue"], 0.0, 1.0)

    return x
