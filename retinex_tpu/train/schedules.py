"""Learning-rate schedules with torch-parity semantics, as jnp functions of the
epoch index (the reference steps its schedulers once per epoch,
trainers/train.py:339).
"""

from __future__ import annotations

import jax.numpy as jnp


def step_decay(base_lr: float, step_size: int = 30, gamma: float = 0.5):
    """torch StepLR parity (reference: trainers/train.py:258-262):
    lr = base * gamma^(epoch // step_size)."""

    def schedule(epoch):
        return base_lr * gamma ** (epoch // step_size)

    return schedule


def cosine_warm_restarts(
    base_lr: float, t_0: int = 10, t_mult: int = 2, eta_min: float = 1e-6
):
    """torch CosineAnnealingWarmRestarts parity (reference:
    trainers/train.py:250-255): restart periods T_0, T_0*t_mult, ... and
    lr = eta_min + (base-eta_min) * (1 + cos(pi * T_cur / T_i)) / 2.

    Implemented with jnp-safe closed forms so it can run under jit.
    """

    def schedule(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(epoch, t_0)
            t_i = jnp.asarray(t_0, jnp.float32)
        else:
            # Number of completed restart cycles: largest n with
            # t_0*(t_mult^n - 1)/(t_mult-1) <= epoch.
            n = jnp.floor(
                jnp.log(epoch / t_0 * (t_mult - 1) + 1.0) / jnp.log(float(t_mult))
            )
            start = t_0 * (jnp.power(float(t_mult), n) - 1.0) / (t_mult - 1)
            t_i = t_0 * jnp.power(float(t_mult), n)
            t_cur = epoch - start
        return eta_min + (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return schedule
