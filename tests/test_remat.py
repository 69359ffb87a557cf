"""Rematerialized training (--remat): losses, gradients, and BN stats match
the standard model to float-reassociation precision (the recomputed forward
compiles with different fusion, so last-ulp differences are expected) —
remat trades FLOPs for activation memory, not semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinex_tpu.losses.total import LossConfig, TotalLoss
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
from retinex_tpu.train.train_state import create_train_state, make_train_step


@pytest.mark.parametrize("preact_aspp", [(True, True), (False, False)])
def test_remat_train_step_identical(preact_aspp):
    preact, aspp = preact_aspp
    criterion = TotalLoss(
        LossConfig(use_perceptual_loss=False, use_freq_loss=False), vgg_apply=None
    )
    batch = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)
    )
    states, dicts = [], []
    for remat in (False, True):
        model = MultiScaleUPRetinex(use_preact=preact, use_aspp=aspp, remat=remat)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (2, 32, 32, 3), lambda s: 1e-3
        )
        step = make_train_step(model, criterion, mesh=None, donate=False)
        new_state, loss_dict = step(state, batch)
        states.append(new_state)
        dicts.append(loss_dict)

    np.testing.assert_allclose(
        float(dicts[0]["total"]), float(dicts[1]["total"]), rtol=1e-6
    )
    # Adam's first step on a near-zero gradient amplifies last-ulp grad
    # differences (the rematerialized forward compiles with different fusion)
    # into visible update differences — same bound as the sharded-step test:
    # max within 2.1*lr, bulk of parameters tight.
    lr = 1e-3
    diffs = np.concatenate(
        [
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(
                jax.tree_util.tree_leaves(states[0].params),
                jax.tree_util.tree_leaves(states[1].params),
            )
        ]
    )
    assert diffs.max() <= 2.1 * lr, diffs.max()
    assert np.quantile(diffs, 0.999) < 1e-5, np.quantile(diffs, 0.999)
    for a, b in zip(
        jax.tree_util.tree_leaves(states[0].batch_stats),
        jax.tree_util.tree_leaves(states[1].batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-6)


def test_remat_param_tree_unchanged():
    """remat must not rename or restructure the params pytree (checkpoints
    interchange between remat and standard runs)."""
    x = jnp.zeros((1, 32, 32, 3))
    v0 = MultiScaleUPRetinex(remat=False).init(jax.random.PRNGKey(0), x, train=False)
    v1 = MultiScaleUPRetinex(remat=True).init(jax.random.PRNGKey(0), x, train=False)
    p0 = jax.tree_util.tree_structure(v0)
    p1 = jax.tree_util.tree_structure(v1)
    assert p0 == p1
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
