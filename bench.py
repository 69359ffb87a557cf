#!/usr/bin/env python3
"""Benchmark: classical enhance throughput, 1080p frames/sec/chip.

The BASELINE.json headline: >=5,000 1080p frames/sec/chip in classical enhance
mode (the fused RGB->Lab->CLAHE(L)->RGB pipeline the reference runs per-image
through OpenCV on CPU, enhancers/adaptive_params.py:121-169). Frames are
1920x1088 (1080p letterboxed to /32, utils/letterbox.py:45).

Methodology notes (this environment): the axon TPU platform's
block_until_ready returns before execution completes, and repeated identical
dispatches can be short-circuited — so we cycle distinct inputs and use a
slope measurement (K executions + one forced scalar fetch, minus the 1-execution
baseline) to cancel the tunnel round-trip.

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


def _timed(fn, inputs, k):
    start = time.perf_counter()
    out = None
    for i in range(k):
        out = fn(inputs[i % len(inputs)])
    float(jnp.sum(out))  # force full execution + sync
    return time.perf_counter() - start


def measure_batch_seconds(fn, inputs, k_small=1, k_big=9, repeats=3):
    """Per-execution seconds via the slope between k_small and k_big runs."""
    _timed(fn, inputs, 1)  # warmup/compile
    t1 = min(_timed(fn, inputs, k_small) for _ in range(repeats))
    t2 = min(_timed(fn, inputs, k_big) for _ in range(repeats))
    return max((t2 - t1) / (k_big - k_small), 1e-9)


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    batch = 8 if on_tpu else 2

    from retinex_tpu.ops.clahe import clahe_lab_rgb

    fn = jax.jit(clahe_lab_rgb)

    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.random((batch, H, W, 3), dtype=np.float32) * 0.4)
        for _ in range(4)
    ]

    k_big = 9 if on_tpu else 3
    dt = measure_batch_seconds(fn, inputs, k_big=k_big)
    fps = batch / dt
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
