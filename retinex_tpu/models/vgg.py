"""Flax VGG19 feature slices for the perceptual loss.

The reference uses torchvision's pretrained VGG19 features split at indices
i<=4 / i<=9 / i<=18 (reference: losses/loss.py:195-211) — i.e. the outputs of
pool1 (64ch, /2), pool2 (128ch, /4) and pool3 (256ch, /8). (The reference's
comments label these conv1_2/conv2_2/conv4_2, but index 4/9/18 are the pool
layers; we reproduce the actual behavior.)

Weights: torchvision is not shippable here, so:
- `init_params(rng)` gives deterministic He-init weights — still a useful fixed
  random-projection feature space for an *unsupervised* perceptual loss; and
- `load_torch_state_dict` converts a torchvision `vgg19.features` state_dict
  (or any torch Sequential with the same indices) when the user supplies one
  (e.g. exported to .npz via `scripts/export_vgg.py` on a machine with
  torchvision).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from retinex_tpu.models.layers import max_pool_nonneg

# (name, out_channels) per conv, with pools marked as "pool".
_SLICE_DEFS = {
    "slice1": [("conv0", 64), ("conv2", 64), "pool"],
    "slice2": [("conv5", 128), ("conv7", 128), "pool"],
    "slice3": [("conv10", 256), ("conv12", 256), ("conv14", 256), ("conv16", 256), "pool"],
}

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], dtype=jnp.float32)


class VGG19Features(nn.Module):
    """Three-stage VGG19 feature extractor (pool1/pool2/pool3 outputs)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: NHWC RGB in [0,1]. Returns (f1, f2, f3)."""
        x = (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)
        outs = []
        for slice_name, layers in _SLICE_DEFS.items():
            for layer in layers:
                if layer == "pool":
                    # Post-ReLU input, so the zero-init pool is exact (and
                    # spatial-sharding-safe; see layers.max_pool_nonneg).
                    x = max_pool_nonneg(x, (2, 2), strides=(2, 2))
                else:
                    name, ch = layer
                    x = nn.relu(
                        nn.Conv(
                            ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name=name
                        )(x)
                    )
            outs.append(x)
        return tuple(outs)


def load_torch_state_dict(state_dict) -> dict:
    """Convert a torch `vgg19.features` state_dict ({'0.weight', '0.bias', ...})
    to this module's params. Accepts torch tensors or numpy arrays."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params = {}
    for layers in _SLICE_DEFS.values():
        for layer in layers:
            if layer == "pool":
                continue
            name, _ = layer
            idx = name.removeprefix("conv")
            params[name] = {
                "kernel": np.ascontiguousarray(sd[f"{idx}.weight"].transpose(2, 3, 1, 0)),
                "bias": sd[f"{idx}.bias"],
            }
    return {"params": params}


def load_npz(path: str) -> dict:
    """Load VGG19 feature weights from an .npz exported from torchvision."""
    data = dict(np.load(path))
    return load_torch_state_dict(data)
