"""Image-quality evaluation driver (wires up the metric library).

The reference ships a full metric suite (utils/utils.py:95-333) that no entry
flow ever calls (SURVEY.md §2 item 9). This driver wires it: compute the
no-reference bundle (brightness/contrast/entropy/NIQE/saturation/naturalness)
for every image in a directory, plus PSNR/SSIM/MSE against a paired reference
directory when given (matched by filename). Writes metrics.csv and prints a
summary.

TPU-first batching (round-2 review finding: the old loop jitted one
per-image call per distinct shape — pathological through a tunnel-attached
device): images are bucketed by exact decoded size, vmapped metric bundles
run `batch_size` images per dispatch with uint8 host->device transfers, and
each shape bucket compiles exactly once. `mesh` shards chunks across a data
axis (metrics are per-image, so sharding is exact).
"""

from __future__ import annotations

import csv
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from retinex_tpu.data.dataset import decode_image, list_image_files
from retinex_tpu.ops.metrics import calculate_metrics

NO_REF_KEYS = ("mean_brightness", "contrast", "entropy", "niqe", "saturation", "naturalness")
REF_KEYS = ("psnr", "ssim", "mse")


def _image_size(path: str) -> tuple[int, int]:
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    return h, w


def evaluate_directory(
    input_dir: str,
    reference_dir: str | None = None,
    output_csv: str | None = None,
    batch_size: int = 16,
    mesh=None,
) -> list[dict]:
    """Returns one dict per image; optionally writes a CSV."""
    from retinex_tpu.infer.batch_driver import pad_for_mesh, shard_batch_fn

    files = list_image_files(input_dir, recursive=False)
    if not files:
        raise ValueError(f"No images found in {input_dir}")

    # Pair each file with its reference (same basename, same decoded size) so
    # buckets are homogeneous in (shape, has_ref) — one jit each.
    def ref_for(path: str, size: tuple[int, int]) -> str | None:
        if reference_dir is None:
            return None
        rp = os.path.join(reference_dir, os.path.basename(path))
        if os.path.exists(rp) and _image_size(rp) == size:
            return rp
        return None

    buckets: dict[tuple[int, int, bool], list[tuple[str, str | None]]] = {}
    for path in files:
        h, w = _image_size(path)
        rp = ref_for(path, (h, w))
        buckets.setdefault((h, w, rp is not None), []).append((path, rp))

    @functools.lru_cache(maxsize=16)
    def metrics_fn(shape, with_ref: bool):
        del shape  # one compile per decoded size

        def fn(batch_u8):
            x = batch_u8.astype(jnp.float32) / 255.0
            if with_ref:
                img, ref = x[:, 0], x[:, 1]
                return jax.vmap(lambda a, b: calculate_metrics(a, b))(img, ref)
            return jax.vmap(lambda a: calculate_metrics(a, None))(x[:, 0])

        if mesh is not None:
            return shard_batch_fn(fn, mesh)
        return jax.jit(fn)

    rows_by_path: dict[str, dict] = {}
    for (h, w, has_ref), pairs in buckets.items():
        fn = metrics_fn((h, w), has_ref)
        for i in range(0, len(pairs), batch_size):
            chunk = pairs[i : i + batch_size]
            imgs = []
            for path, rp in chunk:
                stack = [decode_image(path)]
                if has_ref:
                    stack.append(decode_image(rp))
                imgs.append(np.stack(stack, axis=0))
            batch = np.stack(imgs, axis=0)  # [N, 1|2, H, W, 3] u8
            batch, n = pad_for_mesh(batch, mesh)
            out = jax.tree.map(np.asarray, fn(jnp.asarray(batch)))
            for j, (path, _rp) in enumerate(chunk):
                rows_by_path[path] = {
                    "image": os.path.basename(path),
                    **{k: float(v[j]) for k, v in out.items()},
                }

    rows = [rows_by_path[p] for p in files]
    keys = [k for k in NO_REF_KEYS + REF_KEYS if any(k in r for r in rows)]
    print(f"Evaluated {len(rows)} images:")
    for k in keys:
        vals = [r[k] for r in rows if k in r]
        if vals:
            print(f"  {k}: mean {np.mean(vals):.4f}  min {np.min(vals):.4f}  max {np.max(vals):.4f}")

    if output_csv:
        os.makedirs(os.path.dirname(output_csv) or ".", exist_ok=True)
        with open(output_csv, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["image"] + keys)
            writer.writeheader()
            for r in rows:
                writer.writerow({k: r.get(k, "") for k in ["image"] + keys})
        print(f"Wrote {output_csv}")
    return rows
