"""Data-parallel mesh: 8 virtual CPU devices, sharded train step numerics match
single-device, batch padding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from retinex_tpu.losses.total import LossConfig, TotalLoss
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
from retinex_tpu.parallel.mesh import create_mesh, pad_to_multiple, shard_batch
from retinex_tpu.train.train_state import create_train_state, make_train_step


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_mesh_and_batch_sharding():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    batch = np.random.default_rng(0).random((16, 8, 8, 3)).astype(np.float32)
    sharded = shard_batch(batch, mesh)
    assert sharded.shape == (16, 8, 8, 3)
    # Each device holds 16/8 = 2 samples.
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_pad_to_multiple():
    batch = np.ones((5, 4, 4, 3), np.float32)
    padded, n = pad_to_multiple(batch, 8)
    assert padded.shape[0] == 8 and n == 5
    np.testing.assert_array_equal(padded[5], batch[-1])


@pytest.fixture(scope="module")
def setup():
    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    criterion = TotalLoss(
        LossConfig(use_perceptual_loss=False, use_freq_loss=False), vgg_apply=None
    )
    schedule = lambda step: 1e-3  # noqa: E731
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, (8, 32, 32, 3), schedule)
    batch = np.random.default_rng(1).random((8, 32, 32, 3)).astype(np.float32)
    return model, criterion, state, batch


def test_sharded_step_matches_single_device(setup):
    model, criterion, state, batch = setup
    mesh = create_mesh()

    step_single = make_train_step(model, criterion, mesh=None, donate=False)
    step_sharded = make_train_step(model, criterion, mesh=mesh, donate=False)

    s1, d1 = step_single(state, jnp.asarray(batch))
    s8, d8 = step_sharded(state, shard_batch(batch, mesh))

    # Identical batch, identical initial state: losses agree tightly.
    assert float(d1["total"]) == pytest.approx(float(d8["total"]), rel=1e-4)
    # A first Adam step is ~sign(grad)*lr, so cross-device reduction-order noise
    # on near-zero gradients can flip individual updates; bound by 2*lr + slack
    # and require the bulk of parameters to match tightly.
    lr = 1e-3
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    diffs = np.concatenate(
        [np.abs(np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(p1, p8)]
    )
    assert diffs.max() <= 2.1 * lr, diffs.max()
    assert np.quantile(diffs, 0.99) < 1e-4, np.quantile(diffs, 0.99)


def test_sharded_step_runs_multiple_iterations(setup):
    model, criterion, state, batch = setup
    mesh = create_mesh()
    # donate=True consumes the input state's buffers — copy so the
    # module-scoped fixture stays alive for later tests.
    state = jax.tree_util.tree_map(jnp.copy, state)
    step = make_train_step(model, criterion, mesh=mesh, donate=True)
    sharded = shard_batch(batch, mesh)
    totals = []
    for _ in range(3):
        state, d = step(state, sharded)
        totals.append(float(d["total"]))
    assert all(np.isfinite(t) for t in totals)
    assert totals[-1] < totals[0]  # optimizing a fixed batch must descend


def test_sharded_packed_step_matches_single_device(setup):
    """The s2d-packed train step (models/packed_train.py) under the data mesh:
    GSPMD shards the packed graph like the standard one; losses and the first
    optimizer step match the single-device packed step."""
    model, criterion, state, batch = setup
    mesh = create_mesh()

    step_single = make_train_step(model, criterion, mesh=None, donate=False, packed=True)
    step_sharded = make_train_step(model, criterion, mesh=mesh, donate=False, packed=True)

    s1, d1 = step_single(state, jnp.asarray(batch))
    s8, d8 = step_sharded(state, shard_batch(batch, mesh))

    assert float(d1["total"]) == pytest.approx(float(d8["total"]), rel=1e-4)
    lr = 1e-3
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    diffs = np.concatenate(
        [np.abs(np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(p1, p8)]
    )
    assert diffs.max() <= 2.1 * lr, diffs.max()
    assert np.quantile(diffs, 0.99) < 1e-4, np.quantile(diffs, 0.99)
