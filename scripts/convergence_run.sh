#!/bin/bash
# Recorded convergence run (VERDICT r3 item 4): real multi-epoch training on
# the TPU under the SHIPPING defaults — packed_train ON (config.py default),
# bf16 (--use_amp), 640px (reference main.py:48 default), dynamic TV weight
# ON, He-init VGG perceptual features (PARITY.md #16: pretrained weights are
# blocked by zero egress).
#
# Data: data/convergence — 24 synthetic low-light derivations (color casts +
# gamma darkening) of the reference's sample inputs
# (scripts/make_convergence_set.py; the reference's own 5 inputs are
# grayscale-as-RGB, too few and too monochrome to exercise the color losses).
#
# Artifacts land in artifacts/convergence_r04/: metrics.jsonl (per-batch +
# per-epoch losses), loss_curves.png, results.csv, visualizations/ — the
# counterpart of the reference's shipped TB event files
# (/root/reference/checkpoints/logs/20251127_102641, total 1.475 -> 1.059).
#
# ONE TPU process at a time (CLAUDE.md): run this alone.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

timeout 5400 python main.py --mode train \
  --train_dir data/convergence \
  --save_dir artifacts/convergence_r04 \
  --image_size 640 --batch_size 4 \
  --use_amp --use_preact --use_aspp \
  --num_epochs 150 --save_freq 25 --patience 40 \
  --num_workers 4 --no-progress_bar --seed 0
