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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="vgg19_features.npz")
    args = parser.parse_args()

    import torchvision

    vgg = torchvision.models.vgg19(weights="IMAGENET1K_V1").features.eval()
    arrays = {}
    for idx in (0, 2, 5, 7, 10, 12, 14, 16):
        layer = vgg[idx]
        arrays[f"{idx}.weight"] = layer.weight.detach().numpy()
        arrays[f"{idx}.bias"] = layer.bias.detach().numpy()
    np.savez(args.out, **arrays)
    print(f"wrote {args.out} ({len(arrays)} arrays)")


if __name__ == "__main__":
    main()
