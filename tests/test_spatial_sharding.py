"""Spatial (height) sharding of the full forward: 8-virtual-device mesh output
matches the single-device forward, and the -inf max-pool GSPMD hazard stays
fixed (models/layers.py:max_pool_nonneg)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
from retinex_tpu.parallel.mesh import create_mesh, replicate
from retinex_tpu.parallel.spatial import make_spatial_forward, spatial_sharding


@pytest.fixture(scope="module")
def setup():
    model = MultiScaleUPRetinex()  # preact+ASPP defaults: the flagship config
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3), jnp.float32, 0.05, 0.9)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def test_spatial_forward_matches_single_device(setup):
    model, variables, x = setup
    mesh = create_mesh()

    ref = model.apply(variables, x, train=False)

    fwd = make_spatial_forward(model, mesh)
    vsh = jax.device_put(variables, replicate(mesh))
    xsh = jax.device_put(x, spatial_sharding(mesh))
    out = fwd(vsh, xsh)

    for name, a, b in zip(["enhanced", "reflectance", "illumination"], out, ref):
        a, b = np.asarray(a), np.asarray(b)
        assert not np.isnan(a).any(), f"{name}: NaN under spatial sharding"
        np.testing.assert_allclose(a, b, atol=2e-6, err_msg=name)


def test_spatial_forward_output_stays_sharded(setup):
    model, variables, x = setup
    mesh = create_mesh()
    fwd = make_spatial_forward(model, mesh)
    out = fwd(
        jax.device_put(variables, replicate(mesh)),
        jax.device_put(x, spatial_sharding(mesh)),
    )
    shard_h = {s.data.shape[1] for s in out[0].addressable_shards}
    assert shard_h == {x.shape[1] // 8}


def test_spatial_forward_rejects_misaligned_height(setup):
    model, variables, _ = setup
    mesh = create_mesh()
    fwd = make_spatial_forward(model, mesh)
    bad = jnp.zeros((1, 40, 128, 3), jnp.float32)  # 40 % (8*8) != 0
    with pytest.raises(ValueError, match="divisible"):
        fwd(jax.device_put(variables, replicate(mesh)), jax.device_put(bad, spatial_sharding(mesh)))


def test_maxpool_nonneg_matches_flax_maxpool():
    """Zero-init pool == nn.max_pool for non-negative input (all model sites)."""
    import flax.linen as nn

    from retinex_tpu.models.layers import max_pool_nonneg

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 24, 8), jnp.float32)
    a = max_pool_nonneg(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
    b = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a2 = max_pool_nonneg(x, (2, 2), strides=(2, 2))
    b2 = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
