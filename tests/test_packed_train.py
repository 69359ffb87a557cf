"""Packed TRAINING path (models/packed_train.py) vs the standard Flax apply.

The packed train step must be the same training program as the standard one:
same outputs, same train-mode BatchNorm batch statistics (phase-aware packed
reductions), same batch-stats pytree, same loss gradients — all up to float
reassociation. Reference behavior under training: trainers/train.py:27-131
over models/model.py:445-455.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from retinex_tpu.models.packed_train import packed_train_apply
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
from retinex_tpu.ops import s2d as s2d_mod


def _setup(preact=True, aspp=True, shape=(2, 32, 32, 3), seed=1):
    model = MultiScaleUPRetinex(use_preact=preact, use_aspp=aspp, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, *shape[1:]), jnp.float32), train=False
    )
    x = jnp.asarray(np.random.default_rng(seed).random(shape, np.float32) * 0.6)
    return model, variables["params"], variables["batch_stats"], x


def test_traceable_pack_functions_match_numpy():
    rng = np.random.default_rng(0)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 5, 7), np.float32))
    k1 = jnp.asarray(rng.standard_normal((1, 1, 5, 7), np.float32))
    k7 = jnp.asarray(rng.standard_normal((7, 7, 2, 1), np.float32))
    kt = jnp.asarray(rng.standard_normal((2, 2, 6, 4), np.float32))
    np.testing.assert_array_equal(
        np.asarray(s2d_mod.pack_kernel_s1_t(k3)), np.asarray(s2d_mod.pack_kernel_s1(k3))
    )
    np.testing.assert_array_equal(
        np.asarray(s2d_mod.pack_kernel_s1_t(k3, dilation=2)),
        np.asarray(s2d_mod.pack_kernel_s1(k3, dilation=2)),
    )
    np.testing.assert_array_equal(
        np.asarray(s2d_mod.pack_kernel_s1_t(k7)), np.asarray(s2d_mod.pack_kernel_s1(k7))
    )
    np.testing.assert_array_equal(
        np.asarray(s2d_mod.pack_kernel_s2_t(k3)), np.asarray(s2d_mod.pack_kernel_s2(k3))
    )
    np.testing.assert_array_equal(
        np.asarray(s2d_mod.pack_pointwise_t(k1)), np.asarray(s2d_mod.pack_pointwise(k1))
    )
    from retinex_tpu.models.packed_inference import _pack_convtranspose2

    np.testing.assert_array_equal(
        np.asarray(s2d_mod.pack_convtranspose2_t(kt)), np.asarray(_pack_convtranspose2(kt))
    )


@pytest.mark.parametrize("preact,aspp", [(True, True), (False, False), (True, False)])
def test_forward_and_batch_stats_parity(preact, aspp):
    model, params, bs, x = _setup(preact, aspp)
    drng = jax.random.PRNGKey(7)
    ref_out, ref_upd = model.apply(
        {"params": params, "batch_stats": bs},
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": drng},
    )
    pk_out, pk_bs = packed_train_apply(model, params, bs, x, drng)

    for name, a, b in zip(("enhanced", "reflectance", "illu"), ref_out, pk_out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name
        )
    # Same pytree (so the train state round-trips) and same statistics.
    assert jtu.tree_structure(ref_upd["batch_stats"]) == jtu.tree_structure(pk_bs)
    jtu.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        ref_upd["batch_stats"],
        pk_bs,
    )


def test_gradient_parity():
    model, params, bs, x = _setup(True, True)
    drng = jax.random.PRNGKey(3)

    def loss_std(p):
        (enh, refl, illu), _ = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": drng},
        )
        return jnp.mean(enh**2) + jnp.mean(illu) + 0.1 * jnp.mean(jnp.abs(refl))

    def loss_pk(p):
        (enh, refl, illu), _ = packed_train_apply(model, p, bs, x, drng)
        return jnp.mean(enh**2) + jnp.mean(illu) + 0.1 * jnp.mean(jnp.abs(refl))

    g_std = jax.grad(loss_std)(params)
    g_pk = jax.grad(loss_pk)(params)
    # Tolerance scaled per-leaf: reassociation-level differences only.
    def check(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-2)
        np.testing.assert_allclose(
            a, b, atol=1e-2 * scale, err_msg=jtu.keystr(path)
        )

    jtu.tree_map_with_path(check, g_std, g_pk)


def test_packed_train_step_matches_standard():
    from retinex_tpu.config import Config
    from retinex_tpu.train.train_state import create_train_state, make_train_step
    from retinex_tpu.train.trainer import build_criterion

    config = Config(use_preact=True, use_aspp=True, use_perceptual_loss=True)
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=jnp.float32)
    criterion = build_criterion(config)
    state = create_train_state(model, jax.random.PRNGKey(0), (2, 32, 32, 3), lambda s: 1e-4)
    x = jnp.asarray(np.random.default_rng(5).random((2, 32, 32, 3), np.float32) * 0.5)

    step_std = make_train_step(model, criterion, donate=False)
    step_pk = make_train_step(model, criterion, donate=False, packed=True)
    s1, l1 = step_std(state, x)
    s2, l2 = step_pk(state, x)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]), rtol=1e-4, atol=1e-5)
    # The packed state keeps the same pytrees (checkpoint/resume compatible)
    # and stays on the standard trajectory within Adam-noise of the tiny
    # gradient reassociation differences.
    assert jtu.tree_structure(s1.params) == jtu.tree_structure(s2.params)
    assert jtu.tree_structure(s1.batch_stats) == jtu.tree_structure(s2.batch_stats)
    jtu.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4
        ),
        s1.params,
        s2.params,
    )
    # A second packed step runs from the packed state (pytree round-trip).
    s3, l3 = step_pk(s2, x)
    assert np.isfinite(float(l3["total"]))


def test_packed_train_step_bf16_runs():
    from retinex_tpu.config import Config
    from retinex_tpu.train.train_state import create_train_state, make_train_step
    from retinex_tpu.train.trainer import build_criterion

    config = Config(use_preact=True, use_aspp=True, use_amp=True)
    model = MultiScaleUPRetinex(use_preact=True, use_aspp=True, dtype=config.compute_dtype)
    criterion = build_criterion(config)
    state = create_train_state(model, jax.random.PRNGKey(0), (2, 32, 32, 3), lambda s: 1e-4)
    x = jnp.asarray(np.random.default_rng(5).random((2, 32, 32, 3), np.float32) * 0.5)
    step = make_train_step(model, criterion, donate=False, packed=True)
    s1, losses = step(state, x)
    assert np.isfinite(float(losses["total"]))


def test_packed_remat_gradients_match_packed():
    """remat=True on the packed path (jax.checkpoint around each resolution
    stage) must reproduce the non-remat packed gradients: remat changes where
    activations come from in the backward pass, not the math. Last-ulp
    differences from refused fusions are the only allowed divergence."""
    model_std, params, bs, x = _setup(True, True)
    model_rmt = MultiScaleUPRetinex(
        use_preact=True, use_aspp=True, dtype=jnp.float32, remat=True
    )
    drng = jax.random.PRNGKey(3)

    def loss(m):
        def fn(p):
            (enh, refl, illu), _ = packed_train_apply(m, p, bs, x, drng)
            return jnp.mean(enh**2) + jnp.mean(illu) + 0.1 * jnp.mean(jnp.abs(refl))

        return fn

    g_std = jax.grad(loss(model_std))(params)
    g_rmt = jax.grad(loss(model_rmt))(params)

    def check(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=1e-5 * scale, err_msg=jtu.keystr(path))

    jtu.tree_map_with_path(check, g_std, g_rmt)

    # Forward outputs and batch-stats updates are also unchanged.
    out_s, upd_s = packed_train_apply(model_std, params, bs, x, drng)
    out_r, upd_r = packed_train_apply(model_rmt, params, bs, x, drng)
    jtu.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        (out_s, upd_s),
        (out_r, upd_r),
    )
