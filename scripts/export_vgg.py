#!/usr/bin/env python3
"""Export torchvision VGG19 feature weights to .npz for the perceptual loss.

Run on any machine with torchvision installed:

    python scripts/export_vgg.py --out vgg19_features.npz

then pass `--vgg_weights vgg19_features.npz` to training. Only the first 19
feature layers (through pool3) are exported — exactly the slices the loss uses
(reference: losses/loss.py:195-211).
"""

import argparse

import numpy as np

CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 16)


def export_features(features, out_path: str) -> int:
    """Export the conv weights of a torch `vgg19.features`-indexed Sequential
    (through pool3) to .npz in the format retinex_tpu.models.vgg.load_npz
    reads. Returns the number of arrays written."""
    arrays = {}
    for idx in CONV_INDICES:
        layer = features[idx]
        arrays[f"{idx}.weight"] = layer.weight.detach().numpy()
        arrays[f"{idx}.bias"] = layer.bias.detach().numpy()
    np.savez(out_path, **arrays)
    return len(arrays)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="vgg19_features.npz")
    args = parser.parse_args()

    import torchvision

    vgg = torchvision.models.vgg19(weights="IMAGENET1K_V1").features.eval()
    n = export_features(vgg, args.out)
    print(f"wrote {args.out} ({n} arrays)")


if __name__ == "__main__":
    main()
