"""The training driver: epochs, early stopping, checkpoints, observability.

Mirrors the reference training flow (trainers/train.py:189-396) TPU-first:
- one jitted train step (forward + 7 losses + clipped Adam update) sharded
  data-parallel over the mesh; bf16 compute replaces CUDA AMP;
- loss scalars stay on device and are fetched once per log interval — the
  reference does 8 blocking .item() syncs per batch (SURVEY.md §3.1);
- early stopping on epoch-mean total loss with patience (reference :270-274,
  :360-381), best/latest Orbax checkpoints (:134-162), sample visualizations
  every 10 epochs (:335-336), loss curves + results.csv at the end (:388-392),
  TB scalars every `log_every` batches and per epoch (:119-122, :356-358).
"""

from __future__ import annotations

import functools
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from retinex_tpu.config import Config
from retinex_tpu.data.augment import augment_batch
from retinex_tpu.data.dataset import get_train_loader
from retinex_tpu.losses.total import LossConfig, TotalLoss
from retinex_tpu.models.retinex_net import MultiScaleUPRetinex, count_parameters
from retinex_tpu.models.vgg import VGG19Features, load_npz
from retinex_tpu.parallel.mesh import create_mesh, pad_to_multiple, shard_batch
from retinex_tpu.train.checkpoint import load_checkpoint, save_checkpoint, wait_for_checkpoints
from retinex_tpu.train.schedules import cosine_warm_restarts, step_decay
from retinex_tpu.train.train_state import create_train_state, make_train_step
from retinex_tpu.utils.logging import MetricLogger, save_loss_curves, save_results_to_csv
from retinex_tpu.utils.viz import visualize_results

LOG_KEYS = ("total", "exposure", "smoothness", "color", "spatial", "decouple", "perceptual", "frequency")


def build_vgg_apply(config: Config):
    """Bound VGG19-features apply for the perceptual loss; deterministic He
    init unless the user supplies exported torchvision weights."""
    if not config.use_perceptual_loss:
        return None
    model = VGG19Features(dtype=config.compute_dtype)
    if config.vgg_weights:
        variables = load_npz(config.vgg_weights)
    else:
        variables = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 32, 32, 3)))
    params = jax.lax.stop_gradient(variables["params"])
    return lambda x: model.apply({"params": params}, x)


def build_criterion(config: Config) -> TotalLoss:
    loss_cfg = LossConfig(
        weight_exp=config.weight_exp,
        weight_smooth=config.weight_smooth,
        weight_col=config.weight_col,
        weight_spa=config.weight_spa,
        weight_decouple=config.weight_decouple,
        weight_perceptual=config.weight_perceptual,
        weight_freq=config.weight_freq,
        use_freq_loss=config.use_freq_loss,
        use_perceptual_loss=config.use_perceptual_loss,
        adaptive_weights=config.adaptive_weights,
    )
    return TotalLoss(loss_cfg, vgg_apply=build_vgg_apply(config))


def train(config: Config) -> dict:
    """Run training; returns {'best_loss', 'epochs_run', 'save_dir'}.

    Preemption awareness (SURVEY §5: the reference has none): SIGTERM/SIGINT
    sets a flag — installed before setup so a signal during compile is also
    caught — the batch loop finishes its current step, a `latest` checkpoint
    is written, and train() returns cleanly for --resume. A SECOND signal
    escalates (restores default handlers and raises KeyboardInterrupt), so a
    hang before the loop stays killable with Ctrl+C Ctrl+C. Handlers restore
    on every exit path (signal handling only works in the main thread; other
    threads skip installation).
    """
    import signal

    preempted = {"flag": False, "signum": None}
    old_handlers = {}

    def _restore_handlers():
        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)
        old_handlers.clear()

    def _on_preempt(signum, frame):
        if preempted["flag"]:
            _restore_handlers()
            raise KeyboardInterrupt
        preempted["flag"] = True
        preempted["signum"] = signum

    try:
        for sig in (signal.SIGTERM, signal.SIGINT):
            old_handlers[sig] = signal.signal(sig, _on_preempt)
    except ValueError:
        old_handlers = {}

    try:
        return _train_impl(config, preempted)
    finally:
        _restore_handlers()


def _train_impl(config: Config, preempted: dict) -> dict:
    mesh = create_mesh(config.n_devices)
    n_dev = mesh.devices.size
    # Multi-host: this process loads/feeds only its 1/process_count share of
    # every global batch (parallel/distributed.py); padding aligns to the
    # LOCAL device count so the assembled global array is mesh-divisible.
    proc_idx, proc_count = jax.process_index(), jax.process_count()
    local_batch = max(config.batch_size // proc_count, 1)
    pad_multiple = max(n_dev // proc_count, 1)
    print(f"Training on {n_dev} device(s): {mesh}")

    model = MultiScaleUPRetinex(
        use_preact=config.use_preact,
        use_aspp=config.use_aspp,
        dtype=config.compute_dtype,
        remat=config.remat,
    )
    criterion = build_criterion(config)

    if config.use_cosine_scheduler:
        epoch_schedule = cosine_warm_restarts(config.lr)
    else:
        epoch_schedule = step_decay(config.lr, config.lr_decay_step, config.lr_decay_gamma)

    # drop_last whenever at least one full batch remains: a ragged final batch
    # would be padded by duplicating samples, which biases gradients and the
    # logged loss means (the dupes are indistinguishable from real samples in
    # every reduction). With shuffle=True a different random remainder is
    # dropped each epoch, so all data is still seen across epochs. Datasets
    # smaller than one batch keep the padding path (nothing to drop).
    def make_loader(drop_last: bool):
        return get_train_loader(
            image_dir=config.train_dir,
            batch_size=local_batch,
            image_size=config.image_size,
            num_workers=config.num_workers,
            shuffle=True,
            drop_last=drop_last,
            seed=config.seed,
            shard=(proc_idx, proc_count),
        )

    loader = make_loader(drop_last=True)
    if len(loader) == 0:
        loader = make_loader(drop_last=False)
    steps_per_epoch = max(len(loader), 1)
    dropped = len(loader.dataset) - steps_per_epoch * local_batch * proc_count
    print(
        f"{len(loader.dataset)} images, {steps_per_epoch} batches/epoch"
        + (f" ({dropped} re-shuffled into later epochs)" if dropped > 0 else "")
    )

    # The reference steps its scheduler per *epoch*; express that as a
    # per-step optax schedule. Under grad accumulation the inner chain's
    # step counter advances once per APPLIED update (every grad_accum
    # micro-batches): applied step s corresponds to micro-batch s*accum, so
    # epoch = (s * accum) // steps_per_epoch — exact for any accum, no drift
    # when steps_per_epoch isn't divisible by accum.
    accum = max(config.grad_accum, 1)
    lr_schedule = lambda step: epoch_schedule((step * accum) // steps_per_epoch)  # noqa: E731

    rng = jax.random.PRNGKey(config.seed)
    state = create_train_state(
        model,
        rng,
        (config.batch_size, config.image_size, config.image_size, 3),
        lr_schedule,
        weight_decay=config.weight_decay,
        grad_accum=accum,
    )
    if accum > 1:
        print(
            f"Gradient accumulation x{accum}: effective batch "
            f"{config.batch_size * accum} (optimizer applies every {accum} batches)"
        )
    print(f"Model parameters: {count_parameters(state.params):,}")

    start_epoch, best_loss = 0, float("inf")
    if config.resume:
        state, start_epoch, best_loss = load_checkpoint(state, config.resume)
        print(f"Resumed from {config.resume} at epoch {start_epoch}")

    # The packed step's win is the MXU (narrow convs run 4x wider — 2x bf16
    # step throughput on v5e, BENCH_NOTES.md); on CPU the packing einsums are
    # pure overhead, so the default-ON flag only engages off-CPU.
    on_cpu = jax.devices()[0].platform == "cpu"
    use_packed = config.packed_train and config.image_size % 32 == 0 and not on_cpu
    if config.packed_train and not use_packed:
        reason = "CPU backend" if on_cpu else "image_size not divisible by 32"
        print(f"packed_train: {reason}, using standard step")
    train_step = make_train_step(model, criterion, mesh=mesh, packed=use_packed)

    if proc_idx == 0:
        log_dir = os.path.join(config.save_dir, "logs", datetime.now().strftime("%Y%m%d_%H%M%S"))
        logger = MetricLogger(log_dir)
        print(f"Logs: {log_dir}")
    else:

        class _NullLogger:
            def add_scalar(self, *a, **k):
                pass

            def add_scalars(self, *a, **k):
                pass

            def close(self):
                pass

        logger = _NullLogger()

    loss_history: dict[str, list[float]] = {k: [] for k in LOG_KEYS}
    aug_rng = jax.random.PRNGKey(config.seed + 1)
    patience_counter = 0
    epochs_run = 0

    if config.profile_dir:
        jax.profiler.start_trace(config.profile_dir)

    for epoch in range(start_epoch, config.num_epochs):
        epoch_start = time.time()
        epoch_sum = None  # stacked [n_losses] device array, one add per batch
        sum_keys: list[str] = []
        num_batches = 0

        # Live progress bar with loss postfix (reference: trainers/train.py:61,
        # :110-116). The postfix refreshes at the logging interval so the bar
        # doesn't force a device sync every batch.
        epoch_iter = iter(loader)
        bar = tqdm(
            enumerate(epoch_iter),
            total=steps_per_epoch,
            desc=f"Epoch {epoch}/{config.num_epochs - 1}",
            leave=False,
            disable=not config.progress_bar,
        )
        for batch_idx, host_batch in bar:
            host_batch, _ = pad_to_multiple(host_batch, pad_multiple)
            # uint8 over the wire; augment_batch normalizes on device.
            batch = shard_batch(host_batch, mesh)
            aug_rng, step_rng = jax.random.split(aug_rng)
            batch = augment_batch(step_rng, batch, basic=True, advanced=config.advanced_augment)
            state, loss_dict = train_step(state, batch)
            num_batches += 1

            stop = preempted["flag"]
            if proc_count > 1:
                # Multi-host: a signal may reach only some hosts. Every host
                # contributes its local flag to a tiny allgather EVERY batch
                # so all hosts take the break (and the collective save) at
                # the same step — a lone host breaking out would deadlock the
                # others in the next gradient all-reduce.
                from jax.experimental import multihost_utils

                stop = bool(
                    multihost_utils.process_allgather(np.asarray(stop)).any()
                )
            if stop:
                preempted["flag"] = True
                bar.close()
                # Early break violates the prefetch iterator's contract
                # unless it is closed (data/dataset.py: the producer thread
                # blocks on the bounded queue otherwise).
                close = getattr(epoch_iter, "close", None)
                if close is not None:
                    close()
                print(
                    f"Signal {preempted['signum']} received: checkpointing and "
                    f"exiting (resume with --resume {config.save_dir}/latest)"
                )
                break

            # Fetch scalars only at the logging interval (one device sync).
            if batch_idx % config.log_every == 0:
                fetched = {k: float(v) for k, v in loss_dict.items()}
                global_step = epoch * steps_per_epoch + batch_idx
                logger.add_scalars("Loss", fetched, global_step)
                bar.set_postfix({k: f"{v:.4f}" for k, v in fetched.items() if k == "total"})
            # Device-side accumulation as ONE stacked array: a single add per
            # batch instead of 8 scalar dispatches (round-2 review finding).
            if not sum_keys:
                sum_keys = [k for k in LOG_KEYS if k in loss_dict]
            stacked = jnp.stack([loss_dict[k] for k in sum_keys])
            epoch_sum = stacked if epoch_sum is None else epoch_sum + stacked

        if preempted["flag"]:
            if proc_idx == 0:
                # Save epoch-1: resume starts at saved+1, so the interrupted
                # epoch RE-RUNS rather than being silently skipped (its
                # remaining batches were never trained).
                save_checkpoint(
                    state, config.save_dir, epoch - 1, best_loss, is_best=False, wait=True
                )
                print(f"Preemption checkpoint written: {config.save_dir}/latest")
            epochs_run = epoch  # epoch incomplete
            break

        sums_np = np.asarray(epoch_sum) if epoch_sum is not None else np.zeros(0)
        avg_losses = {
            k: float(sums_np[i]) / max(num_batches, 1) for i, k in enumerate(sum_keys)
        }
        if "total" not in avg_losses:
            # Loader yielded zero batches this epoch (degenerate dataset /
            # drop-to-multiple edge): keep the loop alive rather than KeyError.
            avg_losses["total"] = float("inf")
        for k, v in avg_losses.items():
            loss_history[k].append(v)

        current_lr = float(epoch_schedule(epoch))
        logger.add_scalar("Learning_Rate", current_lr, epoch)
        logger.add_scalars("Epoch_Loss", avg_losses, epoch)

        epoch_time = time.time() - epoch_start
        print(
            f"Epoch {epoch}: time {epoch_time:.2f}s lr {current_lr:.6f} "
            + " ".join(f"{k}={v:.4f}" for k, v in avg_losses.items())
        )

        # Side-effect outputs (visualizations, checkpoints, curves) are written
        # by process 0 only in multi-host runs; every process computes the same
        # replicated losses, so the early-stop decision stays in lockstep.
        if proc_idx == 0 and epoch % max(config.save_freq, 1) == 0:
            _save_sample_visualizations(model, state, loader, mesh, epoch, config.save_dir)

        current = avg_losses["total"]
        if current < best_loss:
            best_loss = current
            patience_counter = 0
            is_best = True
            print(f"  new best loss: {best_loss:.6f}")
        else:
            patience_counter += 1
            is_best = False
            print(f"  patience: {patience_counter}/{config.patience}")

        if proc_idx == 0:
            save_checkpoint(state, config.save_dir, epoch, best_loss, is_best)
        epochs_run = epoch + 1

        if patience_counter >= config.patience:
            print(f"Early stopping after {epoch + 1} epochs (best {best_loss:.6f})")
            break

    if config.profile_dir:
        jax.profiler.stop_trace()

    logger.close()
    wait_for_checkpoints()  # commit any in-flight async save before returning
    if proc_idx == 0:
        save_loss_curves(loss_history, config.save_dir)
        save_results_to_csv(loss_history, config.save_dir)
    print(f"Training completed. Best loss: {best_loss:.6f}. Models in {config.save_dir}")
    return {"best_loss": best_loss, "epochs_run": epochs_run, "save_dir": config.save_dir}


@functools.partial(jax.jit, static_argnames="model")
def _viz_forward(model, variables, batch):
    """Jitted eval forward for sample visualizations. Un-jitted model.apply
    was fine on CPU but pathological through the axon TPU tunnel (every op a
    separate dispatch: the epoch-0 visualization stalled a real 640px run
    for 25+ minutes, round 4); flax Modules hash, so one compile per shape
    serves the whole run."""
    return model.apply(variables, batch, train=False)


def _save_sample_visualizations(model, state, loader, mesh, epoch, save_dir):
    """Sample grids every 10 epochs (reference: trainers/train.py:474-517)."""
    vis_dir = os.path.join(save_dir, "visualizations")
    os.makedirs(vis_dir, exist_ok=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # Breaking out of a fresh epoch iterator early requires close(): the
    # producer thread would otherwise block on the bounded prefetch queue.
    with iter(loader) as it:
        for batch_idx, host_batch in enumerate(it):
            if batch_idx >= 2:
                break
            batch = jnp.asarray(host_batch[:2].astype(np.float32) / 255.0)
            enhanced, _refl, illu = _viz_forward(model, variables, batch)
            for i in range(min(2, batch.shape[0])):
                visualize_results(
                    batch[i],
                    enhanced[i],
                    illu[i],
                    save_path=os.path.join(vis_dir, f"epoch_{epoch}_batch_{batch_idx}_sample_{i}.png"),
                )
