#!/usr/bin/env python3
"""Quantify the random-VGG perceptual-loss gap (PARITY.md #16).

The reference's PerceptualLoss uses torchvision's ImageNet-pretrained VGG19
(/root/reference/losses/loss.py:195-211). This environment has zero egress and
no cached weights (verified: pip, download.pytorch.org, ~/.keras, ~/.cache all
fail/empty), so the rebuild defaults to He-init random VGG features. This
experiment bounds what that substitution does to the loss function, on the 5
real reference images (/root/reference/data/input/):

1. Per-image perceptual loss values across independent He-init seeds — how
   much the loss SCALE depends on the random features.
2. Cosine similarity of d(perceptual)/d(enhanced) between seeds — whether
   different random features pull the optimization in a consistent direction
   (the random-feature perceptual-loss literature's claim).
3. Perceptual share of the total 7-loss gradient — how much of the training
   signal is at stake either way.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/vgg_gap_experiment.py
Writes scripts/vgg_gap_results.txt; summary recorded in PARITY.md #16.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from retinex_tpu.infer.batch_driver import decode_bucket
from retinex_tpu.losses.losses import perceptual_loss
from retinex_tpu.losses.total import LossConfig, LossState, TotalLoss
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
from retinex_tpu.models.vgg import VGG19Features

REF_DIR = "/root/reference/data/input"
SIZE = 256  # letterboxed eval size (VGG slices to conv4_2 at 1024px on CPU is
# ~100x slower; feature statistics are scale-stable at 256)
SEEDS = (0, 1, 2, 3)


def main():
    files = sorted(
        os.path.join(REF_DIR, f) for f in os.listdir(REF_DIR) if f.endswith(".jpg")
    )
    batch = decode_bucket(files, SIZE, SIZE, SIZE, num_workers=4)
    x = jnp.asarray(batch, jnp.float32) / 255.0  # [5, 256, 256, 3] "low" input

    # A plausible "enhanced" output: untrained flagship model forward (the
    # enhance-mode default, reference simple_enhance.py:66-68).
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True)
    mvars = model.init(jax.random.PRNGKey(7), x[:1], train=False)
    enhanced, _refl, illu = model.apply(mvars, x, train=False)

    vgg = VGG19Features()
    vgg_vars = {s: VGG19Features().init(jax.random.PRNGKey(s), x[:1]) for s in SEEDS}

    lines = []

    def log(s):
        print(s)
        lines.append(s)

    log(f"images: {[os.path.basename(f) for f in files]}")
    log(f"eval size: {SIZE}x{SIZE}, enhanced = untrained flagship forward")
    log("")

    # 1) loss values per seed
    log("perceptual loss per He-init seed (rows: image, cols: seed):")
    vals = np.zeros((len(files), len(SEEDS)))
    for j, s in enumerate(SEEDS):
        apply_s = lambda im, s=s: vgg.apply(vgg_vars[s], im)
        for i in range(len(files)):
            vals[i, j] = float(
                perceptual_loss(apply_s, enhanced[i : i + 1], x[i : i + 1])
            )
    for i, f in enumerate(files):
        log(f"  {os.path.basename(f)[:20]:22s} " + " ".join(f"{v:9.4f}" for v in vals[i]))
    spread = vals.std(axis=1) / vals.mean(axis=1)
    log(f"  relative spread across seeds (std/mean per image): {spread.round(3)}")
    log("")

    # 2) gradient direction agreement between seeds
    log("cosine similarity of d(perceptual)/d(enhanced) between seed pairs:")

    def grad_for(s):
        apply_s = lambda im: vgg.apply(vgg_vars[s], im)
        g = jax.grad(lambda e: perceptual_loss(apply_s, e, x))(enhanced)
        return np.asarray(g).reshape(len(files), -1)

    grads = {s: grad_for(s) for s in SEEDS}
    cos_all = []
    for a in SEEDS:
        for b in SEEDS:
            if a < b:
                ga, gb = grads[a], grads[b]
                cos = (ga * gb).sum(1) / (
                    np.linalg.norm(ga, axis=1) * np.linalg.norm(gb, axis=1) + 1e-12
                )
                cos_all.append(cos)
                log(f"  seeds ({a},{b}): per-image cos = {cos.round(3)}")
    cos_all = np.stack(cos_all)
    log(f"  mean cos across pairs/images: {cos_all.mean():.3f}  min: {cos_all.min():.3f}")
    log("")

    # 3) perceptual share of the total-loss gradient (seed 0)
    apply0 = lambda im: vgg.apply(vgg_vars[0], im)
    crit_on = TotalLoss(LossConfig(use_perceptual_loss=True), vgg_apply=apply0)
    crit_off = TotalLoss(LossConfig(use_perceptual_loss=False))

    def total_grad(crit):
        def f(e):
            total, _d, _s = crit(x, e, illu, _refl, LossState.create())
            return total

        return np.asarray(jax.grad(f)(enhanced)).reshape(len(files), -1)

    g_on, g_off = total_grad(crit_on), total_grad(crit_off)
    g_perc = g_on - g_off
    share = np.linalg.norm(g_perc, axis=1) / (np.linalg.norm(g_on, axis=1) + 1e-12)
    cos_t = (g_on * g_off).sum(1) / (
        np.linalg.norm(g_on, axis=1) * np.linalg.norm(g_off, axis=1) + 1e-12
    )
    log("perceptual share of the total-loss gradient (seed 0, default weights):")
    log(f"  ||g_perceptual|| / ||g_total|| per image: {share.round(3)}")
    log(f"  cos(g_total_with, g_total_without):        {cos_t.round(3)}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vgg_gap_results.txt")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
