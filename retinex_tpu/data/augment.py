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


@functools.partial(jax.jit, static_argnames=("basic", "advanced"))
def augment_batch(
    key: jax.Array, batch: jnp.ndarray, basic: bool = True, advanced: bool = False
) -> jnp.ndarray:
    """Augment an NHWC batch (uint8 or float [0,1]); returns float [0,1].

    Accepting uint8 lets the trainer ship quarter-size host->device transfers
    and normalize on device."""
    b = batch.shape[0]
    keys = jax.random.split(key, 12)
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
        # 1. gamma
        g_on = _mask(b, keys[4], 0.5)
        gamma = _per_sample(b, keys[5], 0.6, 1.8)
        x_g = jnp.power(jnp.maximum(x, 1e-8), gamma)
        x = g_on * x_g + (1.0 - g_on) * x
        # 2. contrast around the per-sample mean
        c_on = _mask(b, keys[6], 0.5)
        factor = _per_sample(b, keys[6], 0.8, 1.2)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        x_c = jnp.clip((x - mean) * factor + mean, 0.0, 1.0)
        x = c_on * x_c + (1.0 - c_on) * x
        # 3. brightness
        br_on = _mask(b, keys[7], 0.5)
        shift = _per_sample(b, keys[7], -0.1, 0.1)
        x = jnp.clip(x + br_on * shift, 0.0, 1.0)
        # 4. Gaussian noise, p=0.7
        n_on = _mask(b, keys[8], 0.7)
        sigma = _per_sample(b, keys[9], 0.01, 0.03)
        noise = jax.random.normal(keys[10], x.shape) * sigma
        x = jnp.clip(x + n_on * noise, 0.0, 1.0)
        # 5. saturation via Rec.601 gray mix
        s_on = _mask(b, keys[11], 0.5)
        s_factor = _per_sample(b, keys[11], 0.8, 1.2)
        gray = rgb_to_luma(x)
        x_s = jnp.clip(gray + s_factor * (x - gray), 0.0, 1.0)
        x = s_on * x_s + (1.0 - s_on) * x
        # 6. "hue" shift (reference quirk: additive shift on all channels,
        #    datasets/dataset.py:177-180)
        h_key = jax.random.fold_in(keys[11], 1)
        h_on = _mask(b, h_key, 0.5)
        h_shift = _per_sample(b, jax.random.fold_in(h_key, 2), -0.05, 0.05)
        x = jnp.clip(x + h_on * h_shift, 0.0, 1.0)

    return x
