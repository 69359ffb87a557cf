"""Gradient accumulation (--grad_accum): params update only on every k-th
micro-batch, and k identical micro-batches produce exactly the k=1 update
(mean of identical gradients is the gradient)."""

import numpy as np
import jax
import jax.numpy as jnp

from retinex_tpu.losses.total import LossConfig, TotalLoss
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
from retinex_tpu.train.train_state import create_train_state, make_train_step


def _setup(grad_accum):
    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    criterion = TotalLoss(
        LossConfig(use_perceptual_loss=False, use_freq_loss=False), vgg_apply=None
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (2, 32, 32, 3), lambda s: 1e-3,
        grad_accum=grad_accum,
    )
    step = make_train_step(model, criterion, mesh=None, donate=False)
    return state, step


def test_accum_holds_params_until_kth_step():
    batch = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3), dtype=np.float32))
    state, step = _setup(grad_accum=3)
    p0 = jax.tree_util.tree_leaves(state.params)

    state, _ = step(state, batch)
    state, _ = step(state, batch)
    p_mid = jax.tree_util.tree_leaves(state.params)
    for a, b in zip(p0, p_mid):  # first two micro-steps: accumulate only
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state, _ = step(state, batch)
    p_end = jax.tree_util.tree_leaves(state.params)
    changed = sum(
        not np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p_end)
    )
    assert changed > 0, "third micro-step must apply the accumulated update"


def test_accum_of_identical_batches_matches_single_step():
    batch = jnp.asarray(np.random.default_rng(1).random((2, 32, 32, 3), dtype=np.float32))

    state1, step1 = _setup(grad_accum=1)
    state1, d1 = step1(state1, batch)

    state2, step2 = _setup(grad_accum=2)
    state2, _ = step2(state2, batch)
    state2, d2 = step2(state2, batch)

    assert float(d1["total"]) == float(d2["total"])
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-7)
