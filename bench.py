#!/usr/bin/env python3
"""Benchmark: classical enhance throughput, 1080p frames/sec/chip.

The BASELINE.json headline: >=5,000 1080p frames/sec/chip in classical enhance
mode (the fused RGB->Lab->CLAHE(L)->RGB pipeline the reference runs per-image
through OpenCV on CPU, enhancers/adaptive_params.py:121-169). Frames are
1920x1088 (1080p letterboxed to /32, utils/letterbox.py:45).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the fused CLAHE graph takes minutes to compile
# on a cold tunnel; cache it across runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

BASELINE_FPS = 5000.0
H, W = 1088, 1920


def main():
    platform = jax.devices()[0].platform
    batch = 8 if platform == "tpu" else 2
    iters = 20 if platform == "tpu" else 2

    from retinex_tpu.ops.clahe import clahe_lab_rgb

    use_pallas = platform == "tpu"
    fn = jax.jit(lambda x: clahe_lab_rgb(x, use_pallas=use_pallas))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32) * 0.4)

    # Warmup (compile) + one timed block.
    jax.block_until_ready(fn(x))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    fps = batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "classical_enhance_1080p_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
