"""Unified CLI: train / predict / enhance, mirroring the reference's surface.

`retinex-tpu --mode {train,predict,enhance} ...` covers main.py (reference:
main.py:20-269); `retinex-simple-enhance --input ... --output ...` mirrors the
standalone simple_enhance.py (reference: simple_enhance.py:17-98). Both share
one Config dataclass — no per-entry-point flag drift (SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from retinex_tpu.config import CLASSICAL_MODES, Config, add_config_args, config_from_args


def _build_apply_fn(config: Config, require_checkpoint: bool):
    """Construct the jitted model apply for inference.

    Loads an Orbax checkpoint, a reference .pth (via the converter), or — for
    enhance mode, like the reference (simple_enhance.py:66-68) — uses an
    untrained model. Each distinct input shape compiles once and is cached.
    """
    import jax
    import jax.numpy as jnp

    from retinex_tpu.models.retinex_net import MultiScaleUPRetinex

    model = MultiScaleUPRetinex(
        use_preact=config.use_preact, use_aspp=config.use_aspp, dtype=config.compute_dtype
    )

    variables = None
    ckpt = config.checkpoint
    if ckpt and os.path.exists(ckpt):
        if ckpt.endswith(".pth"):
            from retinex_tpu.models.convert import load_reference_checkpoint

            variables, epoch = load_reference_checkpoint(ckpt, config.use_preact, config.use_aspp)
            print(f"Loaded reference checkpoint {ckpt} (epoch {epoch})")
        else:
            from retinex_tpu.train.checkpoint import load_params_for_inference

            variables = load_params_for_inference(ckpt)
            print(f"Loaded checkpoint {ckpt}")
    elif require_checkpoint:
        raise FileNotFoundError(
            f"Checkpoint not found: {ckpt}. Train a model first or pass --checkpoint."
        )
    if variables is None:
        print("Using untrained model weights (enhance mode default, like the reference)")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    if config.spatial_shard:
        from retinex_tpu.parallel.mesh import create_mesh, replicate
        from retinex_tpu.parallel.spatial import make_spatial_forward, spatial_sharding

        mesh = create_mesh(config.n_devices)
        n = mesh.devices.size
        if n > 1:
            print(f"Spatial sharding: H split over {n} devices (conv halos via GSPMD)")
            sfwd = make_spatial_forward(model, mesh)
            vrep = jax.device_put(variables, replicate(mesh))
            plain = jax.jit(lambda b: model.apply(variables, b, train=False))
            in_shard = spatial_sharding(mesh)

            def apply_fn(batch):
                if batch.shape[1] % (8 * n) == 0:
                    return sfwd(vrep, jax.device_put(batch, in_shard))
                print(f"  H={batch.shape[1]} not divisible by {8 * n}; single-device fallback")
                return plain(batch)

            return apply_fn
        print("Spatial sharding requested but only one device is visible; ignoring")

    if config.packed_inference:
        from retinex_tpu.models.packed_inference import PackedRetinex

        packed = PackedRetinex(model, variables)
        print("Using space-to-depth packed inference")
        return jax.jit(packed)

    @jax.jit
    def apply_fn(batch):
        return model.apply(variables, batch, train=False)

    return apply_fn


def run(config: Config):
    if config.mode == "train":
        os.makedirs(config.save_dir, exist_ok=True)
        from retinex_tpu.parallel.distributed import initialize_distributed

        if initialize_distributed(config):
            import jax

            print(
                f"Multi-host: process {jax.process_index()}/{jax.process_count()}"
                f" via {config.coordinator}"
            )
        from retinex_tpu.train.trainer import train

        for flag, label in [
            (config.use_amp, "bf16 compute (AMP analog)"),
            (config.use_freq_loss, "frequency loss"),
            (config.adaptive_weights, "adaptive (DWA) loss weights"),
            (config.use_preact, "pre-activation residual blocks"),
            (config.use_aspp, "ASPP module"),
            (config.remat, "rematerialized blocks (activation-memory saver)"),
            (config.advanced_augment, "advanced augmentation"),
        ]:
            if flag:
                print(f"  + {label}")
        return train(config)

    if config.mode == "predict":
        from retinex_tpu.infer.predict import predict_batch, predict_single_image

        apply_fn = _build_apply_fn(config, require_checkpoint=True)
        os.makedirs(config.output_dir, exist_ok=True)
        input_path = Path(config.input_path)
        if input_path.is_file():
            return predict_single_image(
                apply_fn,
                str(input_path),
                config.output_dir,
                max_size=config.max_size,
                save_comparison=not config.no_comparison,
            )
        if input_path.is_dir():
            from retinex_tpu.infer.batch_driver import maybe_mesh

            # spatial_shard puts the mesh INSIDE apply_fn (H-axis sharding);
            # wrapping that in the shard_map batch driver would nest two uses
            # of the same mesh axis and fail. Batch-parallel is the faster
            # layout for directories anyway — spatial is for single frames.
            mesh = None if config.spatial_shard else maybe_mesh(config.n_devices)
            if config.spatial_shard:
                print("Directory input: spatial sharding handles each chunk; batch-sharding off")
            return predict_batch(
                apply_fn,
                str(input_path),
                config.output_dir,
                max_size=config.max_size,
                save_comparison=not config.no_comparison,
                batch_size=config.batch_size,
                num_workers=config.num_workers,
                mesh=mesh,
            )
        raise FileNotFoundError(f"Input path does not exist: {config.input_path}")

    if config.mode == "enhance":
        from retinex_tpu.infer.enhance import enhance_batch_images, enhance_single_image

        needs_net = config.classical_mode not in CLASSICAL_MODES
        apply_fn = _build_apply_fn(config, require_checkpoint=False) if needs_net else None
        os.makedirs(config.output_dir, exist_ok=True)
        input_path = Path(config.input_path)
        if input_path.is_file():
            # --spatial_shard + a classical clahe mode: split the single
            # frame's height over the mesh (parallel/spatial.make_spatial_clahe)
            # — the classical counterpart of the net's spatial forward.
            from retinex_tpu.infer.batch_driver import maybe_mesh

            sp_mesh = (
                maybe_mesh(config.n_devices)
                if config.spatial_shard
                and config.classical_mode in ("clahe", "clahe_luma")
                else None
            )
            return enhance_single_image(
                apply_fn,
                str(input_path),
                config.output_dir,
                max_size=config.max_size,
                enable_multi_scale=config.multi_scale,
                enable_content_aware=config.content_aware,
                classical_mode=config.classical_mode,
                use_pallas=config.use_pallas_clahe,
                clip_limit=config.clahe_clip_limit,
                tiles=config.clahe_tiles,
                hist_subsample=config.clahe_hist_subsample,
                mesh=sp_mesh,
            )
        if input_path.is_dir():
            from retinex_tpu.infer.batch_driver import maybe_mesh

            # Same mesh-nesting rule as predict: spatial_shard already uses
            # the mesh inside apply_fn, so the batch driver must not shard.
            mesh = None if (needs_net and config.spatial_shard) else maybe_mesh(config.n_devices)
            return enhance_batch_images(
                apply_fn,
                str(input_path),
                config.output_dir,
                max_size=config.max_size,
                classical_mode=config.classical_mode,
                use_pallas=config.use_pallas_clahe,
                batch_size=config.batch_size,
                num_workers=config.num_workers,
                mesh=mesh,
                clip_limit=config.clahe_clip_limit,
                tiles=config.clahe_tiles,
                hist_subsample=config.clahe_hist_subsample,
                enable_multi_scale=config.multi_scale,
                enable_content_aware=config.content_aware,
            )
        raise FileNotFoundError(f"Input path does not exist: {config.input_path}")

    if config.mode == "evaluate":
        from retinex_tpu.infer.batch_driver import maybe_mesh
        from retinex_tpu.infer.evaluate import evaluate_directory

        ref_dir = config.test_dir if os.path.isdir(config.test_dir) else None
        os.makedirs(config.output_dir, exist_ok=True)
        return evaluate_directory(
            config.input_path,
            reference_dir=ref_dir,
            output_csv=os.path.join(config.output_dir, "metrics.csv"),
            batch_size=config.batch_size,
            mesh=maybe_mesh(config.n_devices),
        )

    raise ValueError(f"Unknown mode: {config.mode}")


def _enable_compile_cache():
    """Persistent XLA compile cache: big fused 640px+ graphs take minutes to
    compile through the axon tunnel; the cache makes re-runs (resume, repeated
    benchmarks, the convergence recipe) start in seconds."""
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # older jax without the knob


def main(argv=None):
    _enable_compile_cache()
    parser = argparse.ArgumentParser(
        description="retinex-tpu: TPU-native low-light image enhancement (UP-Retinex capabilities)"
    )
    add_config_args(parser)
    args = parser.parse_args(argv)
    config = config_from_args(args)
    print(f"Mode: {config.mode}")
    return run(config)


def simple_enhance_main(argv=None):
    """Mirror of the reference's standalone simple_enhance.py CLI."""
    _enable_compile_cache()
    parser = argparse.ArgumentParser(description="Simple enhance (no training required)")
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, default="./results")
    parser.add_argument("--max_size", type=int, default=None)
    # Accepted for reference-CLI compatibility (simple_enhance.py:28) but a
    # no-op: JAX owns device selection on TPU.
    parser.add_argument("--device", type=str, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--multi_scale", action="store_true")
    parser.add_argument("--content_aware", action="store_true")
    # The reference accepts ssr/msr/msrcr; clahe/clahe_luma are additions
    # (the reference's CLAHE only runs inside adaptive post-processing).
    parser.add_argument(
        "--classical", type=str, default=None, choices=list(CLASSICAL_MODES)
    )
    args = parser.parse_args(argv)
    config = Config(
        mode="enhance",
        input_path=args.input,
        output_dir=args.output,
        max_size=args.max_size,
        multi_scale=args.multi_scale,
        content_aware=args.content_aware,
        classical_mode=args.classical,
        checkpoint="",  # untrained net, reference behavior (simple_enhance.py:66-68)
        use_preact=True,
        use_aspp=True,
    )
    return run(config)


if __name__ == "__main__":
    main()
