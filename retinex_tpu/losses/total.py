"""TotalLoss aggregator: weighted 7-loss mix with dynamic texture-adaptive
smoothness weighting and functional DWA adaptive weights.

Mirrors the reference TotalLoss (losses/loss.py:586-798) as a pure function:
instead of a stateful nn.Module with an unboundedly-growing Python loss-history
list (reference quirk, losses/loss.py:731-739), the DWA state is a fixed-size
carry (previous two loss vectors) threaded through the train step — jit-safe
and checkpointable.

NOTE(reference quirk, documented): the reference's train loop never passes
`epoch` to TotalLoss.forward, so its `adaptive_weights and epoch > 1` gate
keeps DWA permanently off in practice (losses/loss.py:691, trainers/train.py:77).
Here DWA activates once two steps of history exist, which is the intended
behavior; disable with adaptive_weights=False for strict behavior parity.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from retinex_tpu.losses.losses import (
    color_loss,
    decoupling_loss,
    exposure_loss,
    frequency_loss,
    perceptual_loss,
    smoothness_loss,
    spatial_consistency_loss,
    texture_complexity,
)

LOSS_NAMES = ("exposure", "smoothness", "color", "spatial", "decouple", "perceptual", "frequency")


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights and toggles (defaults: main.py:60-73, losses/loss.py:607-618)."""

    weight_exp: float = 10.0
    weight_smooth: float = 1.0
    weight_col: float = 0.5
    weight_spa: float = 1.0
    weight_decouple: float = 0.1
    weight_perceptual: float = 1.0
    weight_freq: float = 0.5
    use_freq_loss: bool = False
    use_perceptual_loss: bool = True
    adaptive_weights: bool = False
    use_dynamic_smooth_weight: bool = True
    texture_method: str = "tv"
    dwa_temperature: float = 2.0

    def base_weights(self) -> jnp.ndarray:
        return jnp.asarray(
            [
                self.weight_exp,
                self.weight_smooth,
                self.weight_col,
                self.weight_spa,
                self.weight_decouple,
                self.weight_perceptual,
                self.weight_freq,
            ],
            dtype=jnp.float32,
        )


@dataclasses.dataclass
class LossState:
    """DWA carry: last two per-loss values + step counter. A pytree."""

    prev: jnp.ndarray  # [7]
    prev2: jnp.ndarray  # [7]
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls) -> "LossState":
        z = jnp.zeros((len(LOSS_NAMES),), jnp.float32)
        return cls(prev=z, prev2=z, step=jnp.zeros((), jnp.int32))


jax.tree_util.register_dataclass(
    LossState, data_fields=["prev", "prev2", "step"], meta_fields=[]
)


def _dwa_weights(cfg: LossConfig, state: LossState) -> jnp.ndarray:
    """Dynamic Weight Average-style weights (reference: losses/loss.py:755-798):
    w_i = (loss_i[t-1]/loss_i[t-2]) / T, renormalized to sum to N. Falls back
    to the static weights until two steps of history exist."""
    ratio = jnp.where(state.prev2 > 1e-8, state.prev / jnp.maximum(state.prev2, 1e-8), 1.0)
    w = ratio / cfg.dwa_temperature
    n = float(len(LOSS_NAMES))
    w = n * w / jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.where(state.step >= 2, w, cfg.base_weights())


class TotalLoss:
    """Callable aggregator. Construct once (optionally with a bound VGG apply),
    then call inside the jitted train step.

    vgg_apply: Callable [B,H,W,3]->(f1,f2,f3) or None to disable the
    perceptual term (weight still reported as 0).
    """

    def __init__(self, config: LossConfig | None = None, vgg_apply: Callable | None = None):
        self.config = config or LossConfig()
        self.vgg_apply = vgg_apply

    def __call__(
        self,
        img_low: jnp.ndarray,
        img_enhanced: jnp.ndarray,
        illu_map: jnp.ndarray,
        reflectance: jnp.ndarray | None = None,
        state: LossState | None = None,
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray], LossState]:
        """Returns (total, loss_dict, new_state). loss_dict holds the 8 scalar
        entries of the reference (losses/loss.py:742-751), as device scalars —
        fetch once per logging interval to avoid per-step syncs."""
        cfg = self.config
        state = state or LossState.create()

        l_exp = exposure_loss(img_enhanced, img_low)
        l_smooth = smoothness_loss(illu_map, img_low)
        l_col = color_loss(img_enhanced)
        l_spa = spatial_consistency_loss(img_enhanced, img_low)
        if cfg.use_perceptual_loss and self.vgg_apply is not None:
            l_percep = perceptual_loss(self.vgg_apply, img_enhanced, img_low)
        else:
            l_percep = jnp.zeros(())
        l_dec = (
            decoupling_loss(illu_map, reflectance)
            if reflectance is not None
            else jnp.zeros(())
        )
        l_freq = frequency_loss(img_enhanced, img_low) if cfg.use_freq_loss else jnp.zeros(())

        losses = jnp.stack([l_exp, l_smooth, l_col, l_spa, l_dec, l_percep, l_freq])

        weights = _dwa_weights(cfg, state) if cfg.adaptive_weights else cfg.base_weights()

        if cfg.use_dynamic_smooth_weight:
            avg_complexity = jnp.mean(texture_complexity(img_low, cfg.texture_method))
            w_smooth = jnp.clip(
                weights[1] * (1.0 - avg_complexity * 0.8), 0.1, 5.0
            )
            weights = weights.at[1].set(w_smooth)

        total = jnp.sum(weights * losses)

        new_state = LossState(
            prev=losses, prev2=state.prev, step=state.step + 1
        )
        loss_dict = {"total": total}
        for name, value in zip(LOSS_NAMES, losses):
            loss_dict[name] = value
        return total, loss_dict, new_state
