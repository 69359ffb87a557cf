"""Interop: convert reference PyTorch UP-Retinex checkpoints to Flax variables.

Lets users of the reference load their trained `.pth` checkpoints
(trainers/train.py:147-151 format: {'epoch', 'model_state_dict',
'optimizer_state_dict'}) straight into this framework, and powers the
per-pixel parity tests against the torch reference.

Layout conversions:
- Conv2d weight [O,I,kh,kw]          -> HWIO [kh,kw,I,O]
- ConvTranspose2d weight [I,O,kh,kw] -> HWIO [kh,kw,I,O], spatially flipped
  (flax ConvTranspose correlates the kernel over the dilated input; torch
  computes the conv gradient — a spatial flip apart; verified numerically).
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats.
"""

from __future__ import annotations

import numpy as np


def _conv(sd, name):
    out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _convT(sd, name):
    k = sd[f"{name}.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(k), "bias": sd[f"{name}.bias"]}


def _bn_params(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _bn_stats(sd, name):
    return {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}


def _resblock(sd, prefix, params, stats):
    params["conv1"] = _conv(sd, f"{prefix}.conv1")
    params["bn1"] = _bn_params(sd, f"{prefix}.bn1")
    stats["bn1"] = _bn_stats(sd, f"{prefix}.bn1")
    params["conv2"] = _conv(sd, f"{prefix}.conv2")
    params["bn2"] = _bn_params(sd, f"{prefix}.bn2")
    stats["bn2"] = _bn_stats(sd, f"{prefix}.bn2")
    if f"{prefix}.shortcut.0.weight" in sd:
        params["shortcut_conv"] = _conv(sd, f"{prefix}.shortcut.0")
        params["shortcut_bn"] = _bn_params(sd, f"{prefix}.shortcut.1")
        stats["shortcut_bn"] = _bn_stats(sd, f"{prefix}.shortcut.1")


def _conv_bn_relu(sd, conv_name, bn_name, params, stats):
    params["Conv_0"] = _conv(sd, conv_name)
    params["BatchNorm_0"] = _bn_params(sd, bn_name)
    stats["BatchNorm_0"] = _bn_stats(sd, bn_name)


def _upblock(sd, prefix, params, stats):
    params["up"] = _convT(sd, f"{prefix}.up")
    for name, conv_i, bn_i in (("conv1", 0, 1), ("conv2", 3, 4)):
        p, s = {}, {}
        _conv_bn_relu(sd, f"{prefix}.conv.{conv_i}", f"{prefix}.conv.{bn_i}", p, s)
        params[name] = p
        stats[name] = s


def _aspp(sd, prefix, params, stats):
    for ours, conv_name, bn_name in [
        ("conv1x1", f"{prefix}.conv1x1.0", f"{prefix}.conv1x1.1"),
        ("aspp_branch0", f"{prefix}.aspp_branches.0.0", f"{prefix}.aspp_branches.0.1"),
        ("aspp_branch1", f"{prefix}.aspp_branches.1.0", f"{prefix}.aspp_branches.1.1"),
        ("aspp_branch2", f"{prefix}.aspp_branches.2.0", f"{prefix}.aspp_branches.2.1"),
        ("global_pool_conv", f"{prefix}.global_pool.1", f"{prefix}.global_pool.2"),
        ("fusion", f"{prefix}.fusion.0", f"{prefix}.fusion.1"),
    ]:
        p, s = {}, {}
        _conv_bn_relu(sd, conv_name, bn_name, p, s)
        params[ours] = p
        stats[ours] = s


def _fam(sd, prefix, params):
    for ours, theirs in [
        ("branch1", "branch1"),
        ("branch2_conv", "branch2_conv"),
        ("branch3_conv1", "branch3_conv1"),
        ("branch3_conv2", "branch3_conv2"),
        ("branch4_conv1", "branch4_conv1"),
        ("branch4_conv2", "branch4_conv2"),
        ("fusion", "fusion"),
        ("ca_reduce", "channel_attention.1"),
        ("ca_expand", "channel_attention.3"),
        ("sa_conv", "spatial_attention.0"),
    ]:
        params[ours] = _conv(sd, f"{prefix}.{theirs}")


def torch_state_dict_to_variables(state_dict, use_preact: bool, use_aspp: bool):
    """Convert a reference model_state_dict (torch tensors or numpy arrays) to
    Flax variables {'params': ..., 'batch_stats': ...} for MultiScaleUPRetinex."""
    sd = {}
    for k, v in state_dict.items():
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: dict = {}
    stats: dict = {}

    # --- IENet ---
    ie_p: dict = {"input_layer": _conv(sd, "ie_net.input_layer")}
    ie_s: dict = {}
    for ours, theirs in [("enc1", "ie_net.enc1"), ("enc2", "ie_net.enc2"), ("enc3", "ie_net.enc3")]:
        p, s = {}, {}
        _resblock(sd, theirs, p, s)
        ie_p[ours], ie_s[ours] = p, s

    if use_aspp:
        bneck = [("bottleneck1", "ie_net.bottleneck.0"), ("bottleneck2", "ie_net.bottleneck.2")]
        p, s = {}, {}
        _aspp(sd, "ie_net.bottleneck.1", p, s)
        ie_p["aspp"], ie_s["aspp"] = p, s
    else:
        bneck = [("bottleneck1", "ie_net.bottleneck.0"), ("bottleneck2", "ie_net.bottleneck.1")]
    for ours, theirs in bneck:
        p, s = {}, {}
        _resblock(sd, theirs, p, s)
        ie_p[ours], ie_s[ours] = p, s

    for ours, theirs in [("dec3", "ie_net.dec3"), ("dec2", "ie_net.dec2"), ("dec1", "ie_net.dec1")]:
        p, s = {}, {}
        _upblock(sd, theirs, p, s)
        ie_p[ours], ie_s[ours] = p, s

    ie_p["residual_conv"] = _conv(sd, "ie_net.residual_head.0")
    ie_p["residual_out"] = _conv(sd, "ie_net.residual_head.2")
    params["ie_net"], stats["ie_net"] = ie_p, ie_s

    # --- scale towers ---
    for ours, conv_name, fam_prefix in [
        ("scale1", "scale1.0", "scale1.2"),
        ("scale2", "scale2.1", "scale2.3"),
        ("scale3", "scale3.1", "scale3.3"),
    ]:
        p: dict = {"conv": _conv(sd, conv_name), "fam": {}}
        _fam(sd, fam_prefix, p["fam"])
        params[ours] = p

    params["fusion"] = _conv(sd, "fusion")
    params["output_layer"] = _conv(sd, "output_layer")

    import jax

    to_jnp = lambda t: jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), t)  # noqa: E731
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}


def load_reference_checkpoint(path: str, use_preact: bool, use_aspp: bool):
    """Load a reference `.pth` checkpoint file into Flax variables.

    Requires torch (CPU is fine) to unpickle; returns (variables, epoch).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    variables = torch_state_dict_to_variables(sd, use_preact, use_aspp)
    return variables, int(ckpt.get("epoch", -1)) if isinstance(ckpt, dict) else -1
