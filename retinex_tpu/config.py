"""One shared configuration dataclass for every entry point.

The reference has four drifting argparse parsers (main.py:25-117,
trainers/train.py:400-456, predictors/predict.py:239-262,
simple_enhance.py:18-42) papered over with getattr guards (SURVEY.md §5).
Here a single `Config` covers train/predict/enhance; the CLI maps flags 1:1
onto it, and library users construct it directly.
"""

from __future__ import annotations

import dataclasses

# Net-free enhance pipelines accepted by `Config.classical_mode` (routed in
# infer/enhance._classical_enhance).
CLASSICAL_MODES = ("ssr", "msr", "msrcr", "clahe", "clahe_luma")


@dataclasses.dataclass
class Config:
    # Mode
    mode: str = "predict"  # train | predict | enhance | evaluate

    # Paths (reference: main.py:32-43)
    train_dir: str = "./data/train"
    test_dir: str = "./data/test"
    input_path: str = "./data/test"
    output_dir: str = "./results"
    checkpoint: str = "./checkpoints/best"
    save_dir: str = "./checkpoints"

    # Training hyperparameters (reference: main.py:46-57)
    num_epochs: int = 100
    batch_size: int = 8
    image_size: int = 640
    lr: float = 1e-4
    weight_decay: float = 1e-5
    resume: str | None = None
    num_workers: int = 4
    lr_decay_step: int = 30
    lr_decay_gamma: float = 0.5
    save_freq: int = 10  # epochs between sample visualizations (reference: main.py:96)
    seed: int = 0

    # Loss weights (reference: main.py:60-73)
    weight_exp: float = 10.0
    weight_smooth: float = 1.0
    weight_col: float = 0.5
    weight_spa: float = 1.0
    weight_decouple: float = 0.1
    weight_perceptual: float = 1.0
    weight_freq: float = 0.5

    # Inference (reference: main.py:76-81)
    max_size: int | None = None
    no_comparison: bool = False

    # Enhance toggles (reference: main.py:84-87)
    multi_scale: bool = False
    content_aware: bool = False

    # Advanced toggles (reference: main.py:100-115)
    use_amp: bool = False  # on TPU this selects bf16 compute
    patience: int = 20
    use_cosine_scheduler: bool = False
    use_freq_loss: bool = False
    adaptive_weights: bool = False
    use_preact: bool = False
    use_aspp: bool = False
    advanced_augment: bool = False

    # TPU-native extensions (no reference analog)
    use_perceptual_loss: bool = True
    vgg_weights: str | None = None  # .npz exported from torchvision (models/vgg.py)
    n_devices: int | None = None  # data-parallel mesh size (default: all)
    # Multi-host data parallelism (parallel/distributed.py): run the same
    # train command on every host with these three flags set; single-host
    # behavior is unchanged when --coordinator is absent.
    coordinator: str | None = None  # jax.distributed coordinator host:port
    num_processes: int | None = None
    process_id: int | None = None
    profile_dir: str | None = None  # jax.profiler trace output
    # ssr | msr | msrcr | clahe (exact cv2-parity Lab CLAHE) | clahe_luma
    # (fast luma-gain CLAHE, ops/clahe_luma.py — ~1/5 the per-pixel op count,
    # documented reduced parity). None = the trained net.
    classical_mode: str | None = None
    # Pallas gather-based CLAHE pipeline (ops/clahe_gather.py) — the fastest
    # path on TPU (~1.9x the XLA nibble-MXU path, BENCH_NOTES.md). On by
    # default; automatically falls back to the XLA path on CPU or on shapes
    # the gather kernel doesn't support. --no-use_pallas_clahe forces XLA.
    use_pallas_clahe: bool = True
    # CLAHE knobs for the STANDALONE clahe/clahe_luma classical modes. The
    # adaptive (net) post-processing keeps the reference's fixed 2.0 / 8x8
    # (enhancers/adaptive_params.py:149).
    clahe_clip_limit: float = 2.0
    clahe_tiles: int = 8
    # Decimated-histogram speed knob for BOTH clahe modes: estimate the tile
    # histograms from a within-cell s x s subsample (clip/CDF scale follow
    # the reduced area). 1 = exact histograms (default). On the exact-parity
    # Lab `clahe` route, s=2 keeps the full Lab pipeline and reads 52.5 dB /
    # 0.9994 SSIM vs exact on real 1080p photos (s=4: 42.1 dB — bench.py
    # quality_exact_* lines), the highest-quality fast point. On `clahe_luma`
    # s=2 reads 46-51 dB vs the luma mode's own exact histograms
    # (tests/test_clahe_luma.py). Quality scales with the per-tile sample
    # count, so this is a LARGE-frame knob (>=720p); at thumbnail sizes the
    # decimated histograms get noisy (~24 dB at 256px).
    clahe_hist_subsample: int = 1
    # Space-to-depth packed net inference (models/packed_inference.py): exact
    # up to float reassociation and strictly faster on TPU (16.6 vs 11.9 fps
    # at 1080p, BENCH_NOTES.md). On by default; odd-sized inputs fall back to
    # the standard forward automatically.
    packed_inference: bool = True
    # Space-to-depth packed TRAINING (models/packed_train.py): the train-mode
    # forward+backward with the narrow full/half-res convs run 4x wider on
    # the MXU. Same parameters, batch-stats pytree, and losses up to float
    # reassociation (tests/test_packed_train.py); checkpoints interchange
    # with the standard path. Requires image_size divisible by 32 (letterbox
    # default); falls back to the standard step otherwise. Default ON per the
    # round-3 on-chip full-graph A/B (bench.py, 256px b4): 17.6 vs 15.5
    # steps/s f32 and 36.6 vs 18.5 bf16 — the narrow-conv backward is the
    # train step's floor and packing doubles the bf16 step (BENCH_NOTES.md).
    packed_train: bool = True
    # Gradient accumulation (optax.MultiSteps): average gradients across N
    # micro-batches and apply the optimizer every N-th — effective batch =
    # batch_size * N without the HBM. Clipping sees the mean gradient; BN
    # stats update per micro-batch (standard semantics). Keep the same value
    # when resuming (it changes the optimizer-state pytree).
    grad_accum: int = 1
    # Rematerialized training (jax.checkpoint via nn.remat on the IE-net
    # blocks and scale towers; on the packed train step each packed
    # resolution stage is checkpointed, models/packed_train.py): recompute
    # block activations in the backward pass instead of storing them — trades
    # ~1/3 more FLOPs for a large HBM cut, enabling bigger batches / image
    # sizes (640px packed b16 fits only with remat). Losses, gradients, and
    # BN stats match the standard step to float-reassociation precision
    # (tests/test_remat.py, tests/test_packed_train.py).
    remat: bool = False
    # Spatial (H-axis) sharding (parallel/spatial.py): split a single huge
    # frame across all mesh devices. Net predict: GSPMD inserts the conv halo
    # exchanges; requires H divisible by 8*mesh (falls back to single-device
    # otherwise) and disables packed_inference for the run. Classical
    # enhance (clahe/clahe_luma single-file): make_spatial_clahe all_gathers
    # the per-tile histograms over ICI; requires H,W divisible by 2*tiles
    # and mesh | tiles. Useful at batch 1 where data parallelism idles N-1
    # chips.
    spatial_shard: bool = False
    log_every: int = 100  # batches between TB scalar writes (reference: 100)
    progress_bar: bool = True  # tqdm batch bar (reference: trainers/train.py:61)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.use_amp else jnp.float32


def add_config_args(parser, config: Config | None = None):
    """Register every Config field as a --flag on an argparse parser."""
    defaults = config or Config()
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        default = getattr(defaults, f.name)
        if f.type == "bool" or isinstance(default, bool):
            import argparse

            parser.add_argument(
                name,
                action=argparse.BooleanOptionalAction,
                default=default,
                help=f"(default: {default})",
            )
        else:
            tstr = str(f.type)
            if default is not None:
                typ = type(default)
            elif "int" in tstr:
                typ = int
            elif "float" in tstr:
                typ = float
            else:
                typ = str
            parser.add_argument(name, type=typ, default=default, help=f"(default: {default})")
    # Accepted for reference-CLI compatibility (main.py:80) but a no-op:
    # JAX owns device selection on TPU (the old Config.device was dead).
    import argparse

    parser.add_argument("--device", type=str, default=None, help=argparse.SUPPRESS)
    return parser


def config_from_args(args) -> Config:
    """Build a Config from parsed argparse namespace (unknown attrs ignored)."""
    kwargs = {}
    for f in dataclasses.fields(Config):
        if hasattr(args, f.name):
            kwargs[f.name] = getattr(args, f.name)
    return Config(**kwargs)
