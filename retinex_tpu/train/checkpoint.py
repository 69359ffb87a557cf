"""Checkpoint save/load via Orbax, plus reference `.pth` import.

Covers and extends the reference's checkpointing (trainers/train.py:134-186):
the reference saves only {epoch, model, optimizer} and loses scheduler/scaler/
RNG/DWA state on resume (SURVEY.md §5); here the full train state — params,
batch_stats, optimizer state, DWA loss history, dropout RNG, step — round-trips,
so resume is exact. Layout: <save_dir>/{best,latest} Orbax checkpoints.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from retinex_tpu.losses.total import LossState


def _state_to_pytree(state, epoch: int, best_loss: float) -> dict:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "loss_prev": state.loss_state.prev,
        "loss_prev2": state.loss_state.prev2,
        "loss_step": state.loss_state.step,
        "dropout_rng": jax.random.key_data(state.dropout_rng)
        if jax.dtypes.issubdtype(state.dropout_rng.dtype, jax.dtypes.prng_key)
        else state.dropout_rng,
        "step": state.step,
        "epoch": np.asarray(epoch, np.int64),
        "best_loss": np.asarray(best_loss, np.float64),
    }


# One long-lived checkpointer (StandardCheckpointer commits in a background
# thread; construction is not free, so reuse it across epochs).
_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints():
    """Block until in-flight saves commit (no-op unless a wait=False save is
    pending; load paths call this defensively)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(
    state, save_dir: str, epoch: int, best_loss: float, is_best: bool, wait: bool = True
):
    """Save `latest` always and `best` when improved (reference semantics,
    trainers/train.py:134-162).

    Synchronous by default, deliberately: orbax `force=True` deletes the
    existing directory at save() time and commits the replacement later, so
    an async save opens a window where a hard crash loses `latest` entirely —
    a bad trade for overlapping a ~50 MB write. wait=False is available for
    models big enough to flip that trade; pair it with wait_for_checkpoints()
    before exit."""
    os.makedirs(save_dir, exist_ok=True)
    tree = _state_to_pytree(state, epoch, best_loss)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # drain any earlier wait=False save
    latest = os.path.join(os.path.abspath(save_dir), "latest")
    ckptr.save(latest, tree, force=True)
    if is_best:
        ckptr.wait_until_finished()
        ckptr.save(os.path.join(os.path.abspath(save_dir), "best"), tree, force=True)
    if wait:
        ckptr.wait_until_finished()


def load_checkpoint(state, path: str):
    """Restore a checkpoint into an existing (template) train state.

    Returns (state, start_epoch, best_loss); start_epoch = saved epoch + 1
    (reference: trainers/train.py:183).
    """
    wait_for_checkpoints()  # the checkpoint may have been written async just now
    ckptr = _checkpointer()
    template = _state_to_pytree(state, 0, float("inf"))
    restored = ckptr.restore(os.path.abspath(path), template)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        loss_state=LossState(
            prev=restored["loss_prev"],
            prev2=restored["loss_prev2"],
            step=restored["loss_step"],
        ),
        dropout_rng=jax.random.wrap_key_data(restored["dropout_rng"])
        if restored["dropout_rng"].dtype == np.uint32
        else restored["dropout_rng"],
        step=restored["step"],
    )
    return new_state, int(restored["epoch"]) + 1, float(restored["best_loss"])


def load_params_for_inference(path: str) -> dict[str, Any]:
    """Load only {params, batch_stats} for predict/enhance drivers.

    Accepts either an Orbax checkpoint directory or a reference `.pth` file
    (imported via models/convert.py)."""
    if path.endswith(".pth"):
        raise ValueError(
            "For .pth reference checkpoints use "
            "retinex_tpu.models.convert.load_reference_checkpoint(path, use_preact, use_aspp)"
        )
    wait_for_checkpoints()
    ckptr = _checkpointer()
    try:
        restored = ckptr.restore(os.path.abspath(path))
    except ValueError:
        # Orbax refuses topology changes when restoring without a target
        # (e.g. trained on an 8-device mesh, serving on one chip). Inference
        # wants plain replicated host arrays — restore each leaf as numpy,
        # which is topology-agnostic.
        with ocp.PyTreeCheckpointer() as tree_ckptr:
            meta = tree_ckptr.metadata(os.path.abspath(path)).item_metadata
            tree = meta.tree if hasattr(meta, "tree") else meta
            restored = tree_ckptr.restore(
                os.path.abspath(path),
                restore_args=jax.tree.map(
                    lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
                ),
            )
    return {"params": restored["params"], "batch_stats": restored["batch_stats"]}
