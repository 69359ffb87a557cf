"""Checkpoint round-trip: full train state (params, opt state, DWA history,
RNG, step) restores exactly; reference .pth import works end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from retinex_tpu.losses.total import LossConfig, TotalLoss
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex
from retinex_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from retinex_tpu.train.train_state import create_train_state, make_train_step


def _make_state_and_step():
    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    criterion = TotalLoss(LossConfig(use_perceptual_loss=False), vgg_apply=None)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (2, 32, 32, 3), lambda s: 1e-3
    )
    step = make_train_step(model, criterion, mesh=None, donate=False)
    return model, state, step


def test_checkpoint_roundtrip_exact(tmp_path):
    model, state, step = _make_state_and_step()
    batch = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3), dtype=np.float32))
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    save_checkpoint(state, str(tmp_path), epoch=1, best_loss=0.5, is_best=True)

    _, fresh, _ = _make_state_and_step()
    restored, start_epoch, best_loss = load_checkpoint(fresh, str(tmp_path / "latest"))
    assert start_epoch == 2
    assert best_loss == 0.5
    assert int(restored.step) == int(state.step)
    assert int(restored.loss_state.step) == int(state.loss_state.step)

    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer moments restored exactly too.
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state), jax.tree_util.tree_leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Training continues identically from the restored state.
    s_a, d_a = step(state, batch)
    s_b, d_b = step(restored, batch)
    assert float(d_a["total"]) == float(d_b["total"])


def test_best_and_latest_checkpoints(tmp_path):
    _, state, _ = _make_state_and_step()
    save_checkpoint(state, str(tmp_path), epoch=0, best_loss=1.0, is_best=True)
    save_checkpoint(state, str(tmp_path), epoch=1, best_loss=1.0, is_best=False)
    import os

    assert os.path.isdir(tmp_path / "best")
    assert os.path.isdir(tmp_path / "latest")
    _, fresh, _ = _make_state_and_step()
    _, epoch_best, _ = load_checkpoint(fresh, str(tmp_path / "best"))
    _, fresh2, _ = _make_state_and_step()
    _, epoch_latest, _ = load_checkpoint(fresh2, str(tmp_path / "latest"))
    assert epoch_best == 1  # saved at epoch 0 -> resume at 1
    assert epoch_latest == 2


def test_reference_pth_import(reference_path, tmp_path):
    """Save a reference-format .pth and load it through the converter path."""
    import torch

    from models.model import MultiScaleUP_Retinex

    from retinex_tpu.models.convert import load_reference_checkpoint

    torch.manual_seed(0)
    tm = MultiScaleUP_Retinex(use_preact=False, use_aspp=False)
    path = str(tmp_path / "ref.pth")
    torch.save({"epoch": 7, "model_state_dict": tm.state_dict()}, path)

    variables, epoch = load_reference_checkpoint(path, use_preact=False, use_aspp=False)
    assert epoch == 7
    model = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3), dtype=np.float32))
    enh, refl, illu = model.apply(variables, x, train=False)
    assert np.isfinite(np.asarray(enh)).all()


def test_inference_restore_topology_fallback(tmp_path, monkeypatch):
    """load_params_for_inference must survive an Orbax topology refusal
    (checkpoint trained on an N-device mesh, restored on a different device
    count — e.g. serving on one chip): the numpy-restore fallback returns the
    same params/batch_stats."""
    import orbax.checkpoint as ocp

    from retinex_tpu.train.checkpoint import load_params_for_inference

    model, state, step = _make_state_and_step()
    batch = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3), dtype=np.float32))
    state, _ = step(state, batch)
    save_checkpoint(state, str(tmp_path), epoch=0, best_loss=1.0, is_best=True)

    direct = load_params_for_inference(str(tmp_path / "best"))

    def refuse(self, *a, **k):
        raise ValueError("The available devices are different (simulated)")

    monkeypatch.setattr(ocp.StandardCheckpointer, "restore", refuse)
    fallback = load_params_for_inference(str(tmp_path / "best"))

    for a, b in zip(
        jax.tree_util.tree_leaves(direct), jax.tree_util.tree_leaves(fallback)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
