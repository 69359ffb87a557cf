#!/usr/bin/env python3
"""Build the small synthetic low-light COLOR training set for the recorded
convergence run (VERDICT r3 item 4).

The reference ships only 5 input JPEGs (/root/reference/data/input/) and they
are grayscale stored as RGB (R=G=B exactly — CLAUDE.md), which degenerates the
color losses (gray-world differences are identically 0). This script derives a
photo-structured color set from them: each output is one reference image under
a random color cast (per-channel gains), random gamma darkening, random crop,
and mild noise — i.e. synthetic low-light color photos with real spatial
structure. Purely derived data; nothing is copied beyond the pixel content of
the reference's own published sample inputs.

Usage: python scripts/make_convergence_set.py [out_dir] [n_images]
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

SRC_DIR = "/root/reference/data/input"


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "./data/convergence"
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    size = 640
    os.makedirs(out_dir, exist_ok=True)

    sources = []
    for name in sorted(os.listdir(SRC_DIR)):
        img = Image.open(os.path.join(SRC_DIR, name)).convert("RGB")
        sources.append(np.asarray(img).astype(np.float32) / 255.0)

    rng = np.random.default_rng(42)
    for i in range(n_images):
        base = sources[i % len(sources)]
        h, w = base.shape[:2]
        # Random crop to a square at least 640px (sources are ~1024px).
        c = int(rng.integers(size, min(h, w) + 1))
        y0 = int(rng.integers(0, h - c + 1))
        x0 = int(rng.integers(0, w - c + 1))
        crop = base[y0 : y0 + c, x0 : x0 + c]
        img = np.asarray(
            Image.fromarray((crop * 255).astype(np.uint8)).resize(
                (size, size), Image.BILINEAR
            ),
            dtype=np.float32,
        ) / 255.0

        # Color cast: per-channel gains in [0.5, 1.0] (the grayscale source
        # becomes a tinted color image — gray-world/color losses are live).
        gains = rng.uniform(0.5, 1.0, size=3).astype(np.float32)
        img = img * gains
        # Low-light: gamma in [1.8, 3.0] plus a global dim factor.
        gamma = float(rng.uniform(1.8, 3.0))
        dim = float(rng.uniform(0.25, 0.6))
        img = np.power(np.clip(img, 0.0, 1.0), gamma) * dim
        # Mild sensor noise.
        img = img + rng.normal(0.0, 0.01, img.shape).astype(np.float32)
        img = np.clip(img, 0.0, 1.0)

        Image.fromarray((img * 255.0 + 0.5).astype(np.uint8)).save(
            os.path.join(out_dir, f"lowlight_{i:03d}.png")
        )
    print(f"wrote {n_images} images to {out_dir}")


if __name__ == "__main__":
    main()
