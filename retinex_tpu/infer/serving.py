"""Serving export: the inference pipeline as a portable StableHLO artifact.

Production deployment path (no reference analog — the reference serves by
importing torch): `export_enhancer` serializes the jitted u8-in/u8-out
enhance step — the same signature the batched driver dispatches
(infer/enhance.py) — via `jax.export` into a single file a serving host
reloads with `load_enhancer` WITHOUT the model code, checkpoint format, or
Python class definitions. The batch dimension is symbolic, so one artifact
serves any batch size; H/W are static (letterbox canvases are bucketed
anyway, one artifact per canvas).

The artifact embeds StableHLO, so it is forward-compatible across JAX/XLA
releases per the jax.export compatibility policy and can be lowered for
platforms other than the exporting host (pass platforms=("tpu",) to build a
TPU artifact from a CPU host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def make_serving_fn(model, variables, pipeline: str = "enhance"):
    """The uint8 NHWC serving step: batch_u8 -> (enhanced_u8, illu_u8).

    pipeline="enhance" (default) applies the full net-mode enhance path —
    forward + adaptive Lab-CLAHE post-processing — exactly like the batched
    driver's device function (infer/enhance.py net mode), so served bytes
    equal the offline `--mode enhance` PNGs (u8 both ways; floor quantization
    = utils.viz.save_image's truncation). The CLAHE runs on the portable XLA
    path (no Pallas custom calls in the artifact). pipeline="predict" serves
    the raw model outputs, matching `--mode predict`.
    """
    if pipeline not in ("enhance", "predict"):
        raise ValueError(f"pipeline must be 'enhance' or 'predict', got {pipeline!r}")

    def apply_fn(x):
        return model.apply(variables, x, train=False)

    def fn(batch_u8):
        x = batch_u8.astype(jnp.float32) / 255.0
        q = lambda v: jnp.clip(jnp.floor(v * 255.0), 0, 255).astype(jnp.uint8)  # noqa: E731
        if pipeline == "enhance":
            from retinex_tpu.infer.adaptive_params import AdaptiveParameterAdjuster

            out, illu = AdaptiveParameterAdjuster().apply_adaptive_enhancement(
                apply_fn, x, use_pallas=False
            )
            return q(out), q(illu)
        enhanced, _refl, illu = apply_fn(x)
        return q(enhanced), q(illu)

    return fn


def _export_u8_fn(fn, height, width, path, platforms) -> bytes:
    """Shared export tail: jit + symbolic-batch uint8 NHWC spec + serialize
    (+ optional file write). One definition so the net and classical
    exporters cannot drift."""
    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, height, width, 3), jnp.uint8)
    exp = jax_export.export(jax.jit(fn), platforms=platforms)(spec)
    blob = exp.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_enhancer(
    model,
    variables,
    height: int,
    width: int,
    path: str | None = None,
    platforms: tuple[str, ...] | None = None,
    pipeline: str = "enhance",
) -> bytes:
    """Serialize the serving step for a (height, width) canvas; symbolic batch.

    Returns the serialized bytes (also written to `path` when given).
    """
    fn = make_serving_fn(model, variables, pipeline=pipeline)
    return _export_u8_fn(fn, height, width, path, platforms)


def export_classical(
    mode: str,
    height: int,
    width: int,
    path: str | None = None,
    platforms: tuple[str, ...] | None = None,
    clip_limit: float = 2.0,
    tiles: int = 8,
    hist_subsample: int = 1,
) -> bytes:
    """Serialize a no-net classical pipeline (ssr/msr/msrcr/clahe/clahe_luma)
    as a serving artifact: batch_u8 -> enhanced_u8, symbolic batch, portable
    XLA path (no Pallas custom calls). hist_subsample is the decimated-
    histogram knob for clahe/clahe_luma (ignored by ssr/msr/msrcr)."""
    from retinex_tpu.infer.enhance import _classical_enhance

    def fn(batch_u8):
        x = batch_u8.astype(jnp.float32) / 255.0
        out = _classical_enhance(
            x, mode, use_pallas=False, clip_limit=clip_limit, tiles=tiles,
            hist_subsample=hist_subsample,
        )
        return jnp.clip(jnp.floor(out * 255.0), 0, 255).astype(jnp.uint8)

    return _export_u8_fn(fn, height, width, path, platforms)


def load_enhancer(path_or_bytes):
    """Reload an exported artifact; returns fn(batch_u8) -> (enhanced, illu).

    Needs only jax — no retinex_tpu model code or checkpoint machinery.
    """
    blob = path_or_bytes
    if not isinstance(blob, (bytes, bytearray)):
        with open(blob, "rb") as f:
            blob = f.read()
    exp = jax_export.deserialize(bytes(blob))
    return exp.call
