#!/usr/bin/env python3
"""On-chip serving-artifact check (run on the real TPU, one process).

Exports the classical clahe + clahe_luma pipelines for the current platform,
reloads them, and byte-compares served outputs against the offline jitted
path at 1080p. The CPU test suite covers the same round trip on the host
platform (tests/test_serving.py); this script is the hardware leg — it
proves the StableHLO artifacts compile and run through PJRT on the TPU
(the exports are XLA-only by design, no Pallas custom calls, so they are
expected to lower anywhere).

Usage: PYTHONPATH=$PWD python scripts/serving_tpu_check.py
"""

from __future__ import annotations

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402

from retinex_tpu.infer.enhance import _classical_enhance  # noqa: E402
from retinex_tpu.infer.serving import export_classical, load_enhancer  # noqa: E402


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    h, w = 1088, 1920
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)

    for mode, kwargs in [
        ("clahe", {}),
        ("clahe_luma", {}),
        ("clahe_luma", {"hist_subsample": 2}),
        ("msr", {}),
    ]:
        blob = export_classical(mode, height=h, width=w, **kwargs)
        served_fn = load_enhancer(blob)
        served = np.asarray(served_fn(batch))

        @jax.jit
        def offline(b_u8, _mode=mode, _kw=dict(kwargs)):
            x = b_u8.astype(jnp.float32) / 255.0
            out = _classical_enhance(x, _mode, use_pallas=False, **_kw)
            return jnp.clip(jnp.floor(out * 255.0), 0, 255).astype(jnp.uint8)

        want = np.asarray(offline(batch))
        same = np.array_equal(served, want)
        print(
            f"{mode}{kwargs or ''}: artifact {len(blob) / 1e3:.0f} kB, "
            f"served == offline: {same}",
            flush=True,
        )
        assert same, f"{mode} served bytes diverge from the offline path"
    print("serving_tpu_check: all artifacts byte-identical on this platform")


if __name__ == "__main__":
    main()
