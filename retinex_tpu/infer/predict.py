"""Trained-model inference driver.

Mirrors predictors/predict.py: load -> letterbox -> jitted forward -> save
`*_enhanced.png`, `*_illumination.png` and a 3-panel comparison, with per-image
timing (:144-235).

NOTE(PARITY.md): the reference's predict_single_image unpacks 2 values from the
model's 3-tuple and crashes (predictors/predict.py:163 vs models/model.py:455);
we implement the intended behavior (use enhanced + illumination, ignore
reflectance).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from retinex_tpu.infer.enhance import load_image
from retinex_tpu.utils.viz import create_comparison, save_image


def predict_single_image(
    apply_fn,
    image_path: str,
    output_dir: str,
    max_size: int | None = None,
    save_comparison: bool = True,
):
    """apply_fn: [B,H,W,3] -> (enhanced, reflectance, illumination)."""
    img, _original = load_image(image_path, max_size)
    x = jnp.asarray(img)[None]

    start = time.time()
    enhanced, _refl, illu = apply_fn(x)
    enhanced = jax.block_until_ready(enhanced)
    elapsed = time.time() - start
    print(f"Inference time: {elapsed:.4f}s")

    os.makedirs(output_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(image_path))[0]
    save_image(enhanced[0], os.path.join(output_dir, f"{name}_enhanced.png"))
    save_image(illu[0], os.path.join(output_dir, f"{name}_illumination.png"))
    if save_comparison:
        create_comparison(
            img, enhanced[0], illu[0], save_path=os.path.join(output_dir, f"{name}_comparison.png")
        )
    return elapsed


def predict_batch(
    apply_fn,
    input_dir: str,
    output_dir: str,
    max_size: int | None = None,
    save_comparison: bool = True,
    batch_size: int = 8,
    num_workers: int = 8,
    mesh=None,
):
    """Directory sweep (reference: predictors/predict.py:188-235), TPU-first:
    instead of the reference's one-image-at-a-time loop, files are bucketed by
    letterboxed canvas and fed N frames per jitted dispatch with uint8
    host<->device transfers, software-pipelined with decode/save
    (infer/batch_driver.py — the same driver as enhance_batch_images).
    `mesh` shards every chunk over the data axis for multi-chip prediction."""
    import functools
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from retinex_tpu.data.dataset import list_image_files
    from retinex_tpu.infer.batch_driver import run_bucketed, shard_batch_fn

    files = list_image_files(input_dir, recursive=False)
    if not files:
        print(f"No images found in {input_dir}")
        return []
    print(f"Found {len(files)} images")

    os.makedirs(output_dir, exist_ok=True)
    saver = ThreadPoolExecutor(max_workers=num_workers)
    futures = []

    def save_one(img_f32, enhanced, illu, path):
        name = os.path.splitext(os.path.basename(path))[0]
        save_image(enhanced, os.path.join(output_dir, f"{name}_enhanced.png"))
        save_image(illu, os.path.join(output_dir, f"{name}_illumination.png"))
        if save_comparison:
            create_comparison(
                img_f32, enhanced, illu,
                save_path=os.path.join(output_dir, f"{name}_comparison.png"),
            )

    @functools.lru_cache(maxsize=8)
    def pipeline(shape):
        del shape  # one cache entry per canvas

        def quant(v):
            # floor == utils.viz.save_image's uint8 truncation: batched PNGs
            # are byte-identical to predict_single_image's.
            return jnp.clip(jnp.floor(v * 255.0), 0, 255).astype(jnp.uint8)

        def fn(batch_u8):
            x = batch_u8.astype(jnp.float32) / 255.0
            enhanced, _refl, illu = apply_fn(x)
            return quant(enhanced), quant(illu)

        if mesh is not None:
            return shard_batch_fn(fn, mesh)
        import jax

        return jax.jit(fn)

    def drain_cb(chunk, batch_u8, out_np):
        enh_np, illu_np = out_np
        xf = batch_u8.astype(np.float32) / 255.0
        for j, path in enumerate(chunk):
            futures.append(
                saver.submit(
                    save_one,
                    xf[j],
                    enh_np[j].astype(np.float32) / 255.0,
                    illu_np[j].astype(np.float32) / 255.0,
                    path,
                )
            )

    timings = run_bucketed(
        files,
        max_size=max_size,
        batch_size=batch_size,
        num_workers=num_workers,
        make_fn=lambda key: pipeline((key[1], key[2])),
        drain_cb=drain_cb,
        mesh=mesh,
    )
    for f in futures:
        f.result()
    saver.shutdown()
    total = sum(timings)
    print(f"Total: {total:.2f}s, avg {total / len(files):.4f}s/image")
    return timings
