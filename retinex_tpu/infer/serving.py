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


def make_serving_fn(model, variables):
    """The uint8 NHWC serving step: batch_u8 -> (enhanced_u8, illu_u8).

    Matches the batched driver's device function (u8 transfers both ways;
    floor quantization = utils.viz.save_image's truncation, so served bytes
    equal the offline pipeline's PNGs).
    """

    def fn(batch_u8):
        x = batch_u8.astype(jnp.float32) / 255.0
        enhanced, _refl, illu = model.apply(variables, x, train=False)
        q = lambda v: jnp.clip(jnp.floor(v * 255.0), 0, 255).astype(jnp.uint8)  # noqa: E731
        return q(enhanced), q(illu)

    return fn


def export_enhancer(
    model,
    variables,
    height: int,
    width: int,
    path: str | None = None,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Serialize the serving step for a (height, width) canvas; symbolic batch.

    Returns the serialized bytes (also written to `path` when given).
    """
    fn = make_serving_fn(model, variables)
    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, height, width, 3), jnp.uint8)
    exp = jax_export.export(jax.jit(fn), platforms=platforms)(spec)
    blob = exp.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


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
