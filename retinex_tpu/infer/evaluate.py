"""Image-quality evaluation driver (wires up the metric library).

The reference ships a full metric suite (utils/utils.py:95-333) that no entry
flow ever calls (SURVEY.md §2 item 9). This driver wires it: compute the
no-reference bundle (brightness/contrast/entropy/NIQE/saturation/naturalness)
for every image in a directory, plus PSNR/SSIM/MSE against a paired reference
directory when given (matched by filename). Writes metrics.csv and prints a
summary.
"""

from __future__ import annotations

import csv
import os

import jax.numpy as jnp
import numpy as np

from retinex_tpu.data.dataset import decode_image, list_image_files
from retinex_tpu.ops.metrics import calculate_metrics

NO_REF_KEYS = ("mean_brightness", "contrast", "entropy", "niqe", "saturation", "naturalness")
REF_KEYS = ("psnr", "ssim", "mse")


def evaluate_directory(
    input_dir: str, reference_dir: str | None = None, output_csv: str | None = None
) -> list[dict]:
    """Returns one dict per image; optionally writes a CSV."""
    files = list_image_files(input_dir, recursive=False)
    if not files:
        raise ValueError(f"No images found in {input_dir}")
    rows = []
    for path in files:
        img = jnp.asarray(decode_image(path), jnp.float32) / 255.0
        ref = None
        if reference_dir is not None:
            ref_path = os.path.join(reference_dir, os.path.basename(path))
            if os.path.exists(ref_path):
                ref = jnp.asarray(decode_image(ref_path), jnp.float32) / 255.0
                if ref.shape != img.shape:
                    ref = None
        m = calculate_metrics(img, ref)
        row = {"image": os.path.basename(path)}
        row.update({k: float(v) for k, v in m.items()})
        rows.append(row)

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
