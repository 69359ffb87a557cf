"""Shared bucketed-batch infrastructure for directory-scale inference.

The reference processes directories one image at a time, batch 1
(enhancers/simple_enhance.py:202-250, predictors/predict.py:188-235,
utils/utils.py metrics never batched). The TPU-first drivers here instead:

- bucket files by letterboxed canvas (header-only planning, no pixel decode)
  so every chunk is ONE static jit shape — O(buckets) compiles, not O(images);
- decode chunks to uint8 NHWC batches (native C++ threaded decoder with a
  warned PIL fallback) and keep host<->device traffic uint8 both ways;
- software-pipeline the loop: while the device computes chunk N, the host
  decodes chunk N+1 and drains/saves chunk N-1;
- optionally shard every chunk across a `jax.sharding.Mesh` data axis via
  `shard_map` — batch parallelism is embarrassingly parallel here (CLAHE
  histograms, net forwards and metrics are all per-image), so an 8-chip pod
  enhances ~8x faster with byte-identical outputs (tests/test_parallel.py).

Used by infer/enhance.py (enhance_batch_images), infer/predict.py
(predict_batch) and infer/evaluate.py (evaluate_directory).
"""

from __future__ import annotations

import os
import time
from typing import Callable

import jax
import numpy as np

from retinex_tpu.ops.letterbox import letterbox_np, plan_letterbox
from retinex_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple

_warned_native_fallback = False


def plan_canvas(path: str, max_size: int | None):
    """Letterbox canvas for one file without decoding pixels (header only)."""
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    target = max_size if max_size is not None else max(h, w)
    plan = plan_letterbox(h, w, target, auto=True, scaleup=False)
    return target, plan


def bucket_by_canvas(
    files: list[str], max_size: int | None
) -> dict[tuple[int, int, int], list[str]]:
    """Group files by (letterbox target, out_h, out_w) — one jit shape each."""
    buckets: dict[tuple[int, int, int], list[str]] = {}
    for path in files:
        target, plan = plan_canvas(path, max_size)
        buckets.setdefault((target, plan.out_h, plan.out_w), []).append(path)
    return buckets


def decode_bucket(
    paths: list[str], target: int, out_h: int, out_w: int, num_workers: int
) -> np.ndarray:
    """Decode + letterbox a same-canvas bucket to a uint8 NHWC batch —
    C++ pipeline when built (no GIL, libjpeg-turbo), PIL fallback.

    A native failure (bad stride, truncated decode, missing .so) degrades to
    the PIL path but warns ONCE per process — silent degradation of the hot
    decode path was a round-2 review finding."""
    global _warned_native_fallback
    try:
        from retinex_tpu.data.native_loader import (
            decode_letterbox_batch_canvas,
            native_available,
        )

        if native_available():
            return decode_letterbox_batch_canvas(
                paths, target, out_h, out_w, auto_pad=True, scaleup=False,
                num_threads=num_workers,
            )
        if not _warned_native_fallback:
            _warned_native_fallback = True
            import warnings

            warnings.warn(
                "native C++ decode library not available (make -C native); "
                "using the slower PIL decode path for this process",
                RuntimeWarning,
                stacklevel=2,
            )
    except Exception as e:
        if not _warned_native_fallback:
            _warned_native_fallback = True
            import warnings

            warnings.warn(
                f"native C++ decode failed ({type(e).__name__}: {e}); "
                "falling back to PIL for this process",
                RuntimeWarning,
                stacklevel=2,
            )
    from retinex_tpu.data.dataset import decode_image

    imgs = []
    for p in paths:
        rgb = decode_image(p)
        plan = plan_letterbox(rgb.shape[0], rgb.shape[1], target, auto=True, scaleup=False)
        imgs.append(letterbox_np(rgb, plan))
    return np.stack(imgs, axis=0)


def shard_batch_fn(fn: Callable, mesh) -> Callable:
    """Jit a per-batch device function over the mesh's data axis.

    `fn(batch)` must be batch-leading in and out (every output leaf carries
    the batch as axis 0). shard_map splits the batch across devices and runs
    `fn` per shard — this keeps Pallas custom calls valid (each device
    executes the whole kernel on its local shard; no partitioning of the
    custom call itself) and inserts zero collectives, since nothing crosses
    image boundaries. Closed-over arrays (model params) are replicated.

    The caller must pad the batch to a multiple of mesh.size
    (`pad_for_mesh` below).
    """
    from jax.sharding import PartitionSpec as P

    spec = P(DATA_AXIS)
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)
    )


def pad_for_mesh(batch: np.ndarray, mesh) -> tuple[np.ndarray, int]:
    """Pad the chunk's batch axis to a multiple of the mesh size."""
    if mesh is None:
        return batch, batch.shape[0]
    return pad_to_multiple(batch, mesh.devices.size)


def run_bucketed(
    files: list[str],
    *,
    max_size: int | None,
    batch_size: int,
    num_workers: int,
    make_fn: Callable[[tuple[int, int, int]], Callable],
    drain_cb: Callable[[list[str], np.ndarray, object], None] | None,
    mesh=None,
) -> list[float]:
    """The pipelined dispatch loop shared by the batch drivers.

    make_fn(canvas_key) -> device function over a uint8 NHWC batch (already
    mesh-sharded/jitted by the caller if desired); drain_cb(paths, batch_u8,
    outputs_np) consumes fetched results (queue saves / accumulate metrics).
    Returns per-image device+transfer timings (decode overlap subtracted —
    the software pipeline decodes chunk N+1 while chunk N computes).
    """
    import jax.numpy as jnp

    buckets = bucket_by_canvas(files, max_size)
    print(f"{len(buckets)} shape bucket(s): " + ", ".join(
        f"{h}x{w} x{len(v)}" for (_t, h, w), v in buckets.items()))

    timings: list[float] = []
    decode_s = 0.0
    processed = 0

    def drain(pending, overlapped: float = 0.0):
        nonlocal processed
        chunk, out_h, out_w, batch_u8, outputs, t1 = pending
        out_np = jax.tree.map(np.asarray, outputs)  # forces execution + download
        # slice off mesh padding
        out_np = jax.tree.map(lambda a: a[: len(chunk)], out_np)
        t2 = time.time()
        if drain_cb is not None:
            drain_cb(chunk, batch_u8[: len(chunk)], out_np)
        chunk_s = max(t2 - t1 - overlapped, 0.0)
        timings.extend([chunk_s / len(chunk)] * len(chunk))
        processed += len(chunk)
        print(
            f"[{processed}/{len(files)}] {out_h}x{out_w} chunk of {len(chunk)}: "
            f"enhance+io {chunk_s:.3f}s"
        )

    pending = None
    for key, paths in buckets.items():
        target, out_h, out_w = key
        fn = make_fn(key)
        for i in range(0, len(paths), batch_size):
            chunk = paths[i : i + batch_size]
            t0 = time.time()
            batch_u8 = decode_bucket(chunk, target, out_h, out_w, num_workers)
            batch_u8, _n = pad_for_mesh(batch_u8, mesh)
            t1 = time.time()
            outputs = fn(jnp.asarray(batch_u8))  # async dispatch
            decode_s += t1 - t0
            if pending is not None:
                drain(pending, overlapped=t1 - t0)
            pending = (chunk, out_h, out_w, batch_u8, outputs, t1)
    if pending is not None:
        drain(pending)

    total = sum(timings)
    print(
        f"Processed {len(files)} images: enhance {total:.2f}s "
        f"({len(files) / max(total, 1e-9):.1f} img/s), decode {decode_s:.2f}s"
    )
    return timings


def maybe_mesh(n_devices: int | None = None):
    """A data mesh over the addressable devices, or None when there is only
    one (single-device paths stay exactly as before)."""
    from retinex_tpu.parallel.mesh import create_mesh

    n = n_devices if n_devices is not None else len(jax.devices())
    if n <= 1:
        return None
    return create_mesh(n)
