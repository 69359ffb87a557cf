"""Train state + the jitted, mesh-sharded train step.

The TPU-native analog of the reference's hot loop (trainers/train.py:27-131):
forward, 7-loss criterion, backward, global-norm grad clip (max_norm=1.0,
reference :84,:100), Adam with L2 weight decay (reference :241-245), all in one
XLA program. bf16 compute replaces CUDA AMP (no loss scaling needed on TPU).
Data parallelism: the batch is sharded over the 1-D `data` mesh axis and the
gradient all-reduce is inserted by XLA from the shardings — no hand-written
collectives (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from retinex_tpu.losses.total import LossState, TotalLoss
from retinex_tpu.parallel.mesh import DATA_AXIS, create_mesh, replicate, shard_batch_sharding


class RetinexTrainState(train_state.TrainState):
    """TrainState + BatchNorm running stats + DWA loss history."""

    batch_stats: Any = None
    loss_state: LossState = None
    dropout_rng: jax.Array = None


def make_optimizer(
    lr_schedule: Callable,
    weight_decay: float = 1e-5,
    max_grad_norm: float = 1.0,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """clip-by-global-norm -> L2 weight decay -> Adam, matching the torch order
    (clip_grad_norm_ then Adam(weight_decay=...), which folds wd*p into the
    already-clipped gradient before the moment updates).

    grad_accum > 1 wraps the chain in optax.MultiSteps: micro-batch gradients
    average across k train-step calls and the whole chain (clipping included,
    so the clip sees the mean gradient like a real big batch would) applies on
    every k-th. BatchNorm stats still update per micro-batch — the standard
    grad-accumulation semantics everywhere (torch included). Changing
    grad_accum changes the optimizer-state pytree, so resumes must keep it."""
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(lr_schedule),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def create_train_state(
    model,
    rng: jax.Array,
    input_shape: tuple[int, ...],
    lr_schedule: Callable,
    weight_decay: float = 1e-5,
    max_grad_norm: float = 1.0,
    grad_accum: int = 1,
) -> RetinexTrainState:
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng},
        jnp.zeros(input_shape, jnp.float32),
        train=False,
    )
    tx = make_optimizer(lr_schedule, weight_decay, max_grad_norm, grad_accum)
    return RetinexTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
        loss_state=LossState.create(),
        dropout_rng=dropout_rng,
    )


def make_train_step(
    model, criterion: TotalLoss, mesh=None, donate: bool = True, packed: bool = False
):
    """Build the jitted train step.

    step(state, batch) -> (state, loss_dict); batch is NHWC float [0,1],
    sharded over `data` when a mesh is given. The scheduler's learning rate is
    a function of state.step mapped to epochs by the caller's schedule.

    packed=True evaluates the train-mode forward with the full/half-res
    stages s2d-packed (models/packed_train.py) — same parameters, same
    batch-stats pytree, same losses up to float reassociation; the narrow
    convs (and their backward convs) run 4x wider on the MXU. Requires
    H, W divisible by 32 (letterbox guarantees this). A model built with
    remat=True checkpoints each packed resolution stage (jax.checkpoint),
    trading recompute for the activation HBM that blocks 640px b16.
    """

    def step_fn(state: RetinexTrainState, batch: jnp.ndarray):
        dropout_rng = jax.random.fold_in(state.dropout_rng, state.step)

        def loss_fn(params):
            if packed:
                from retinex_tpu.models.packed_train import packed_train_apply

                (enhanced, reflectance, illu), new_bs = packed_train_apply(
                    model, params, state.batch_stats, batch, dropout_rng
                )
                updates = {"batch_stats": new_bs}
            else:
                (enhanced, reflectance, illu), updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": dropout_rng},
                )
            total, loss_dict, new_loss_state = criterion(
                batch, enhanced, illu, reflectance, state.loss_state
            )
            return total, (updates["batch_stats"], loss_dict, new_loss_state)

        grads, (new_batch_stats, loss_dict, new_loss_state) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(
            grads=grads,
            batch_stats=new_batch_stats,
            loss_state=new_loss_state,
        )
        return new_state, loss_dict

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    batch_sharding = shard_batch_sharding(mesh)
    repl = replicate(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sharding),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh=None):
    """Jitted inference step: batch -> (enhanced, reflectance, illumination)."""

    def eval_fn(variables, batch):
        return model.apply(variables, batch, train=False)

    if mesh is None:
        return jax.jit(eval_fn)
    batch_sharding = shard_batch_sharding(mesh)
    repl = replicate(mesh)
    return jax.jit(
        eval_fn,
        in_shardings=(repl, batch_sharding),
        out_shardings=(batch_sharding, batch_sharding, batch_sharding),
    )
