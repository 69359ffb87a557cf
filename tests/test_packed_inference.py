"""Packed (space-to-depth) inference: exactness vs the standard Flax forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from retinex_tpu.models import MultiScaleUPRetinex
from retinex_tpu.models.packed_inference import PackedRetinex


@pytest.fixture(autouse=True)
def _high_precision():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old or "default")


@pytest.mark.parametrize("use_preact", [False, True])
def test_packed_matches_standard(rng, use_preact):
    model = MultiScaleUPRetinex(use_preact=use_preact, use_aspp=use_preact)
    x = jnp.asarray(rng.random((2, 64, 96, 3), dtype=np.float32) * 0.6 + 0.05)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # Randomize BN stats so the inference affine folding is exercised
    # (fresh stats are mean=0/var=1, which would hide scale/mean swaps).
    key = jax.random.PRNGKey(7)
    leaves, treedef = jax.tree_util.tree_flatten(variables["batch_stats"])
    new_leaves = []
    for i, leaf in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        new_leaves.append(jax.random.uniform(k, leaf.shape, minval=0.5, maxval=1.5))
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_unflatten(treedef, new_leaves)

    want_enh, want_refl, want_illu = model.apply(variables, x, train=False)
    packed = PackedRetinex(model, variables)
    got_enh, got_refl, got_illu = packed(x)

    np.testing.assert_allclose(np.asarray(got_illu), np.asarray(want_illu), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_refl), np.asarray(want_refl), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_enh), np.asarray(want_enh), atol=2e-3)


def test_packed_jits(rng):
    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    packed = PackedRetinex(model, variables)
    out = jax.jit(packed)(x)
    assert out[0].shape == (1, 32, 32, 3)
