"""Classical-assisted enhance pipelines as single jitted NHWC graphs.

Mirrors the enhance mode surface (enhancers/simple_enhance.py:135-250 routing,
enhancers/multi_scale.py, enhancers/content_aware.py) with every pipeline —
net forward + classical post-processing — fused on device and batched, instead
of the reference's per-image CPU round trips.

Three pipelines, selected exactly like the reference (:167-175):
- content-aware: saliency(|Laplacian|->15x15 Gaussian->minmax) x 1/(luma+0.1)
  attention; out = net(x) * (1 + 0.2*attention), clamped.
- multi-scale: 3-scale pyramid features (RGB+luma+|torch.gradient| edges);
  one global scalar 1 + sum(w_i*mean(feat_i)*0.1), w=[.5,.3,.2]; clamped.
- adaptive (default): Lab-CLAHE on the net output (infer/adaptive_params.py).

Plus the pure-classical SSR/MSR/MSRCR path (no net) from
ops/retinex_classical.py — the BASELINE throughput configuration.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from retinex_tpu.config import CLASSICAL_MODES
from retinex_tpu.infer.adaptive_params import AdaptiveParameterAdjuster
from retinex_tpu.ops.colorspace import rgb_to_luma
from retinex_tpu.ops.filters import central_gradient, gaussian_blur, laplacian
from retinex_tpu.ops.letterbox import letterbox_np, plan_letterbox
from retinex_tpu.ops.resize import resize_bilinear
from retinex_tpu.ops.retinex_classical import msr_enhance, ssr_enhance
from retinex_tpu.utils.viz import create_comparison, save_image


def compute_saliency_map(x: jnp.ndarray) -> jnp.ndarray:
    """|Laplacian(gray_u8)| -> 15x15 Gaussian -> min-max normalize
    (reference: enhancers/content_aware.py:19-59, done in OpenCV on CPU).
    x: [B,H,W,3] float [0,1] -> [B,H,W,1]."""
    gray = jnp.round(rgb_to_luma(jnp.round(x * 255.0) / 255.0) * 255.0)
    sal = jnp.abs(laplacian(gray))
    sal = gaussian_blur(sal, 15, 0.0)
    mn = jnp.min(sal, axis=(1, 2, 3), keepdims=True)
    mx = jnp.max(sal, axis=(1, 2, 3), keepdims=True)
    return (sal - mn) / (mx - mn + 1e-8)


def compute_attention_map(x: jnp.ndarray) -> jnp.ndarray:
    """saliency * 1/(luma+0.1), min-max normalized
    (reference: enhancers/content_aware.py:61-91)."""
    luma = rgb_to_luma(x)
    att = compute_saliency_map(x) * (1.0 / (luma + 0.1))
    mn = jnp.min(att, axis=(1, 2, 3), keepdims=True)
    mx = jnp.max(att, axis=(1, 2, 3), keepdims=True)
    return (att - mn) / (mx - mn + 1e-8)


def extract_multi_scale_features(x: jnp.ndarray) -> list[jnp.ndarray]:
    """Per-scale 7-channel features: RGB + Rec.601 luma + central-difference
    edge magnitude, at scales 1.0/0.5/0.25
    (reference: enhancers/multi_scale.py:16-59)."""
    feats = []
    h, w = x.shape[1], x.shape[2]
    for scale in (1.0, 0.5, 0.25):
        xs = x if scale == 1.0 else resize_bilinear(x, int(h * scale), int(w * scale))
        luma = rgb_to_luma(xs)
        gx = central_gradient(xs, axis=2)
        gy = central_gradient(xs, axis=1)
        edges = jnp.sqrt(gx * gx + gy * gy)
        feats.append(jnp.concatenate([xs, luma, edges], axis=-1))
    return feats


class ContentAwareEnhancer:
    """Saliency-guided content-aware boosting (fused with the net forward)."""

    def apply_content_aware_enhancement(self, apply_fn, image):
        x = jnp.asarray(image)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        attention = compute_attention_map(x)
        enhanced, _refl, illu = apply_fn(x)
        out = jnp.clip(enhanced * (1.0 + 0.2 * attention), 0.0, 1.0)
        return (out[0], illu[0]) if squeeze else (out, illu)


class MultiScaleEnhancer:
    """Pyramid feature analysis -> one global scalar adjustment
    (reference: enhancers/multi_scale.py:61-115)."""

    def apply_multi_scale_enhancement(self, apply_fn, image):
        x = jnp.asarray(image)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        feats = extract_multi_scale_features(x)
        enhanced, _refl, illu = apply_fn(x)
        weights = (0.5, 0.3, 0.2)
        # PER-IMAGE means (reference semantics, enhancers/multi_scale.py:87-98,
        # which only ever sees batch 1): a whole-batch jnp.mean would couple
        # images in the batched driver.
        adjustment = jnp.ones((x.shape[0], 1, 1, 1), x.dtype)
        for w, f in zip(weights, feats):
            adjustment = adjustment + w * jnp.mean(f, axis=(1, 2, 3), keepdims=True) * 0.1
        out = jnp.clip(enhanced * adjustment, 0.0, 1.0)
        return (out[0], illu[0]) if squeeze else (out, illu)

    # Alias kept for reference-API parity (enhancers/multi_scale.py:102).
    enhance_with_pyramid = apply_multi_scale_enhancement


def load_image(image_path: str, max_size: int | None = None):
    """Decode + letterbox (reference: enhancers/simple_enhance.py:23-62).
    Returns ([H,W,3] float32 numpy in [0,1], (W, H) original size)."""
    from PIL import Image

    with Image.open(image_path) as img:
        rgb = np.asarray(img.convert("RGB"))
        original_size = (rgb.shape[1], rgb.shape[0])
    h, w = rgb.shape[:2]
    if max_size is not None:
        plan = plan_letterbox(h, w, max_size, auto=True, scaleup=False)
    else:
        plan = plan_letterbox(h, w, (h, w), auto=True, scaleup=False)
    out = letterbox_np(rgb, plan).astype(np.float32) / 255.0
    return out, original_size


def enhance_single_image(
    apply_fn,
    image_path: str,
    output_dir: str,
    max_size: int | None = None,
    adjuster: AdaptiveParameterAdjuster | None = None,
    enable_multi_scale: bool = False,
    enable_content_aware: bool = False,
    classical_mode: str | None = None,
    use_pallas: bool | None = None,
    save_outputs: bool = True,
    clip_limit: float = 2.0,
    tiles: int = 8,
    hist_subsample: int = 1,
    mesh=None,
):
    """Route one image through exactly one pipeline and save
    enhanced/illumination/comparison PNGs
    (reference: enhancers/simple_enhance.py:135-199 + the main.py:246
    `adjuster=` keyword, which the reference forgot to accept — fixed here,
    see PARITY.md). clip_limit/tiles apply to the standalone clahe/clahe_luma
    modes only; the adaptive path keeps the reference's fixed 2.0 / 8x8
    (enhancers/adaptive_params.py:149). hist_subsample is the clahe_luma
    decimated-histogram speed knob (ops/clahe_luma.py)."""
    img, _original_size = load_image(image_path, max_size)
    x = jnp.asarray(img)

    start = time.time()
    if classical_mode in CLASSICAL_MODES:
        enhanced = _classical_enhance(
            x, classical_mode, use_pallas, clip_limit, tiles, hist_subsample,
            mesh=mesh,
        )
        illu = rgb_to_luma(jnp.asarray(img))  # luminance stands in for the net's illu map
    elif enable_content_aware:
        enhanced, illu = ContentAwareEnhancer().apply_content_aware_enhancement(apply_fn, x)
    elif enable_multi_scale:
        enhanced, illu = MultiScaleEnhancer().apply_multi_scale_enhancement(apply_fn, x)
    else:
        adjuster = adjuster or AdaptiveParameterAdjuster()
        enhanced, illu = adjuster.apply_adaptive_enhancement(apply_fn, x, use_pallas=use_pallas)
    enhanced = jax.block_until_ready(enhanced)
    elapsed = time.time() - start

    if save_outputs:
        os.makedirs(output_dir, exist_ok=True)
        name = os.path.splitext(os.path.basename(image_path))[0]
        save_image(enhanced, os.path.join(output_dir, f"{name}_enhanced.png"))
        save_image(illu, os.path.join(output_dir, f"{name}_illumination.png"))
        create_comparison(img, enhanced, save_path=os.path.join(output_dir, f"{name}_comparison.png"))
    return enhanced, illu, elapsed


def _classical_enhance(
    x: jnp.ndarray,
    classical_mode: str,
    use_pallas,
    clip_limit: float = 2.0,
    tiles: int = 8,
    hist_subsample: int = 1,
    mesh=None,
):
    """Route the no-net classical pipelines (batched NHWC or single HWC).

    mesh: when given (CLI --spatial_shard with a clahe mode), split each
    frame's HEIGHT across the mesh (parallel/spatial.make_spatial_clahe —
    tile histograms all_gathered over ICI, everything else shard-local) on
    cell-divisible shapes; other shapes fall back to single-device routing.
    """
    if mesh is not None and classical_mode in ("clahe", "clahe_luma"):
        from retinex_tpu.parallel.spatial import make_spatial_clahe, spatial_sharding

        squeeze = x.ndim == 3
        xb = x[None] if squeeze else x
        h, w = xb.shape[1], xb.shape[2]
        n = int(mesh.devices.size)
        if tiles % n == 0 and h % (2 * tiles) == 0 and w % (2 * tiles) == 0:
            fn = make_spatial_clahe(
                mesh,
                mode=classical_mode,
                clip_limit=clip_limit,
                tiles=tiles,
                hist_subsample=hist_subsample,
            )
            out = fn(jax.device_put(xb, spatial_sharding(mesh)))
            return out[0] if squeeze else out
        print(
            f"spatial CLAHE needs H,W % {2 * tiles} == 0 and mesh | tiles; "
            f"got {(h, w)} on {n} devices — falling back to single-device"
        )
    if classical_mode == "ssr":
        return ssr_enhance(x)
    if classical_mode == "clahe":
        # Pure Lab-CLAHE (the reference's post-processing step as a standalone
        # enhancer — the BASELINE throughput configuration).
        from retinex_tpu.ops.clahe import clahe_lab_rgb

        return clahe_lab_rgb(
            x, clip_limit=clip_limit, tiles=tiles, use_pallas=use_pallas,
            hist_subsample=hist_subsample,
        )
    if classical_mode == "clahe_luma":
        # Fast luma-gain CLAHE (ops/clahe_luma.py): reduced-parity mode past
        # the Lab pipeline's speed-of-light (BENCH_NOTES.md round-3 SOL).
        from retinex_tpu.ops.clahe_luma import clahe_luma_rgb

        return clahe_luma_rgb(
            x, clip_limit=clip_limit, tiles=tiles, use_pallas=use_pallas,
            hist_subsample=hist_subsample,
        )
    return msr_enhance(x, mode=classical_mode)


def enhance_batch_images(
    apply_fn,
    input_dir: str,
    output_dir: str,
    max_size: int | None = None,
    classical_mode: str | None = None,
    use_pallas: bool | None = None,
    batch_size: int = 8,
    num_workers: int = 8,
    save_outputs: bool = True,
    mesh=None,
    clip_limit: float = 2.0,
    tiles: int = 8,
    hist_subsample: int = 1,
    enable_multi_scale: bool = False,
    enable_content_aware: bool = False,
):
    """Batch enhance over a directory, N frames per device dispatch.

    Unlike the reference's one-image-at-a-time loop
    (enhancers/simple_enhance.py:202-250 — which also skips multi-scale/
    content-aware in batch mode, :81; here they batch like every other
    pipeline), files are bucketed by letterboxed canvas shape
    (infer/batch_driver.py) and fed to the batched NHWC pipeline
    `batch_size` at a time: C++ threaded decode -> one jitted dispatch per
    chunk -> threaded PNG encode. When `mesh` is given each chunk is sharded
    across its data axis (shard_map — byte-identical outputs, ~mesh-size
    speedup). Returns per-image enhance timings (decode/save excluded, like
    the reference's per-image numbers which also exclude I/O setup).
    """
    from concurrent.futures import ThreadPoolExecutor

    from retinex_tpu.data.dataset import VALID_EXTENSIONS_ENHANCE, list_image_files
    from retinex_tpu.infer.batch_driver import run_bucketed, shard_batch_fn

    files = list_image_files(input_dir, recursive=False, extensions=VALID_EXTENSIONS_ENHANCE)
    if not files:
        print(f"No images found in {input_dir}")
        return []
    print(f"Found {len(files)} images")

    os.makedirs(output_dir, exist_ok=True)
    adjuster = AdaptiveParameterAdjuster()
    saver = ThreadPoolExecutor(max_workers=num_workers) if save_outputs else None
    futures = []

    def save_one(img_f32, enhanced, illu, path):
        name = os.path.splitext(os.path.basename(path))[0]
        save_image(enhanced, os.path.join(output_dir, f"{name}_enhanced.png"))
        save_image(illu, os.path.join(output_dir, f"{name}_illumination.png"))
        create_comparison(
            img_f32, enhanced, save_path=os.path.join(output_dir, f"{name}_comparison.png")
        )

    on_accel = jax.devices()[0].platform != "cpu"
    mode_key = classical_mode if classical_mode in CLASSICAL_MODES else "net"

    @functools.lru_cache(maxsize=8)
    def quantized_pipeline(shape):
        """uint8-in -> uint8-out device function: host<->device traffic is
        uint8 both ways (4x less than float — decisive when the accelerator
        sits behind a network tunnel, and still less PCIe in production)."""
        del shape  # distinct cache entries per canvas

        def quant(v):
            # floor == utils.viz.save_image's uint8 truncation, so batched
            # outputs are byte-identical to the per-image path (for u8-derived
            # values like the CLAHE path, v*255 is an exact integer and floor
            # and round agree).
            return jnp.clip(jnp.floor(v * 255.0), 0, 255).astype(jnp.uint8)

        def fn(batch_u8):
            from retinex_tpu.ops.clahe_gather import clahe_rgb_u8_gather, gather_supported

            if (
                mode_key in ("clahe", "clahe_luma")
                and on_accel
                and use_pallas is not False  # --no-use_pallas_clahe forces XLA
                and gather_supported(batch_u8.shape[1], batch_u8.shape[2], tiles, tiles)
            ):
                if mode_key == "clahe_luma":
                    from retinex_tpu.ops.clahe_luma import clahe_luma_rgb_u8

                    return clahe_luma_rgb_u8(
                        batch_u8, clip_limit=clip_limit, tiles_x=tiles, tiles_y=tiles,
                        hist_subsample=hist_subsample,
                    ), None
                return clahe_rgb_u8_gather(
                    batch_u8, clip_limit=clip_limit, tiles_x=tiles, tiles_y=tiles
                ), None
            x = batch_u8.astype(jnp.float32) / 255.0
            if mode_key in CLASSICAL_MODES:
                return quant(
                    _classical_enhance(
                        x, mode_key, use_pallas, clip_limit, tiles, hist_subsample
                    )
                ), None
            # Net modes: route exactly like enhance_single_image (the
            # content-aware/multi-scale enhancers are batch-aware with
            # per-image statistics).
            if enable_content_aware:
                out, illu = ContentAwareEnhancer().apply_content_aware_enhancement(apply_fn, x)
            elif enable_multi_scale:
                out, illu = MultiScaleEnhancer().apply_multi_scale_enhancement(apply_fn, x)
            else:
                out, illu = adjuster.apply_adaptive_enhancement(apply_fn, x, use_pallas=use_pallas)
            return quant(out), quant(illu)

        if mesh is not None:
            return shard_batch_fn(fn, mesh)
        return jax.jit(fn)

    def drain_cb(chunk, batch_u8, out_np):
        if saver is None:
            return
        enh_np, illu_u8 = out_np
        xf = batch_u8.astype(np.float32) / 255.0
        if illu_u8 is not None:  # net mode: the model's illumination map
            illu_np = illu_u8.astype(np.float32) / 255.0
        else:
            # Classical modes: luma stands in for the illumination map
            # (matches enhance_single_image) — computed on host from
            # the already-decoded bytes, zero device traffic.
            illu_np = xf @ np.asarray([0.299, 0.587, 0.114], np.float32)
        for j, path in enumerate(chunk):
            futures.append(
                saver.submit(
                    save_one, xf[j], enh_np[j].astype(np.float32) / 255.0, illu_np[j], path
                )
            )

    timings = run_bucketed(
        files,
        max_size=max_size,
        batch_size=batch_size,
        num_workers=num_workers,
        make_fn=lambda key: quantized_pipeline((key[1], key[2])),
        drain_cb=drain_cb,
        mesh=mesh,
    )

    if saver is not None:
        for f in futures:
            f.result()
        saver.shutdown()
    return timings
