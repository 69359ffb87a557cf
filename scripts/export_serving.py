#!/usr/bin/env python3
"""Export a trained checkpoint as a serving artifact (StableHLO).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/export_serving.py \
        --checkpoint ckpts/best --height 1088 --width 1920 \
        --out enhancer_1080p.shlo [--use_preact] [--use_aspp] [--platform tpu]

The artifact is the u8-in/u8-out enhance step for one letterbox canvas with
a symbolic batch dimension (infer/serving.py). Pass --platform tpu on a CPU
host to build a TPU-lowered artifact.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="Orbax dir or reference .pth")
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--use_preact", action="store_true")
    ap.add_argument("--use_aspp", action="store_true")
    ap.add_argument("--platform", default=None, help="e.g. tpu (default: exporting host)")
    ap.add_argument(
        "--pipeline", default="enhance", choices=("enhance", "predict"),
        help="enhance = net + adaptive CLAHE (matches --mode enhance); "
        "predict = raw model outputs (matches --mode predict)",
    )
    args = ap.parse_args()

    from retinex_tpu.infer.serving import export_enhancer
    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    if args.checkpoint.endswith(".pth"):
        from retinex_tpu.models.convert import load_reference_checkpoint

        variables, _epoch = load_reference_checkpoint(
            args.checkpoint, args.use_preact, args.use_aspp
        )
    else:
        from retinex_tpu.train.checkpoint import load_params_for_inference

        variables = load_params_for_inference(args.checkpoint)

    model = MultiScaleUPRetinex(use_preact=args.use_preact, use_aspp=args.use_aspp)
    platforms = (args.platform,) if args.platform else None
    blob = export_enhancer(
        model, variables, height=args.height, width=args.width, path=args.out,
        platforms=platforms, pipeline=args.pipeline,
    )
    print(f"wrote {args.out}: {len(blob) / 1e6:.2f} MB "
          f"(canvas {args.height}x{args.width}, {args.pipeline} pipeline, symbolic batch)")


if __name__ == "__main__":
    main()
