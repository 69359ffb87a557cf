"""Adaptive parameter analysis + CLAHE enhancement (jitted).

Mirrors enhancers/adaptive_params.py: brightness-histogram features (:24-68),
the rule-based parameter table (:70-119), and Lab-CLAHE post-processing of the
network output (:121-169) — but as fused on-device graphs instead of the
reference's per-image GPU->CPU OpenCV round trip (:191-198).

NOTE(reference quirk, kept in spirit): the reference computes
adjust_parameters() and then never uses the result (:185); we still expose the
feature/parameter API (it's part of the public surface) but the enhancement
path applies CLAHE only, like the reference actually does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from retinex_tpu.ops.clahe import clahe_lab_rgb
from retinex_tpu.ops.colorspace import rgb_to_luma


@functools.partial(jax.jit, static_argnames=())
def _brightness_features_jax(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """x: [H,W,3] or [B,H,W,3] float [0,1]. OpenCV-gray (Rec.601 on uint8)
    features (reference: enhancers/adaptive_params.py:45-68)."""
    gray = jnp.round(rgb_to_luma(jnp.round(x * 255.0) / 255.0) * 255.0)
    return {
        "mean_brightness": jnp.mean(gray) / 255.0,
        "brightness_std": jnp.std(gray) / 255.0,
        "dark_pixel_ratio": jnp.mean(gray < 50.0),
        "mid_pixel_ratio": jnp.mean((gray >= 50.0) & (gray <= 200.0)),
        "bright_pixel_ratio": jnp.mean(gray > 200.0),
    }


class AdaptiveParameterAdjuster:
    """Rule-based parameter adjustment + CLAHE application."""

    default_params = {
        "enhance_strength": 1.0,
        "color_balance": 1.0,
        "brightness_boost": 1.0,
        "contrast_adjust": 1.0,
    }

    def calculate_brightness_features(self, image) -> dict[str, float]:
        feats = _brightness_features_jax(jnp.asarray(image))
        return {k: float(v) for k, v in feats.items()}

    def adjust_parameters(self, image) -> dict[str, float]:
        """The reference's rule table (enhancers/adaptive_params.py:70-119)."""
        f = self.calculate_brightness_features(image)
        params = dict(self.default_params)
        mb = f["mean_brightness"]
        if mb < 0.2:
            params["enhance_strength"], params["brightness_boost"] = 1.5, 1.3
        elif mb < 0.4:
            params["enhance_strength"], params["brightness_boost"] = 1.3, 1.2
        elif mb > 0.7:
            params["enhance_strength"], params["brightness_boost"] = 0.8, 0.9
        std = f["brightness_std"]
        if std < 0.1:
            params["contrast_adjust"] = 1.3
        elif std < 0.2:
            params["contrast_adjust"] = 1.1
        else:
            params["contrast_adjust"] = 0.9
        dark = f["dark_pixel_ratio"]
        if dark > 0.6:
            params["color_balance"] = 1.2
        elif dark > 0.3:
            params["color_balance"] = 1.1
        return params

    def apply_clahe_enhancement(self, image, use_pallas: bool | None = None):
        """Lab-space CLAHE on the L channel (clip 2.0, 8x8 tiles)."""
        return clahe_lab_rgb(jnp.asarray(image), use_pallas=use_pallas)

    def apply_adaptive_enhancement(self, apply_fn, image, use_pallas: bool | None = None):
        """Net forward then CLAHE on the output (reference :171-200).
        apply_fn: batch -> (enhanced, reflectance, illumination)."""
        x = jnp.asarray(image)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        # Computed for API parity; unused (reference quirk, :185). The rule
        # table branches on host floats, so it cannot run under a jit trace
        # (the batched enhance pipeline jits this whole function) — and the
        # discarded result makes skipping it there behavior-identical.
        if not isinstance(x, jax.core.Tracer):
            self.adjust_parameters(x)
        enhanced, _refl, illu = apply_fn(x)
        enhanced = clahe_lab_rgb(jnp.clip(enhanced, 0.0, 1.0), use_pallas=use_pallas)
        if squeeze:
            return enhanced[0], illu[0]
        return enhanced, illu
