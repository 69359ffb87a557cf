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
        adjustment = 1.0
        for w, f in zip(weights, feats):
            adjustment = adjustment + w * jnp.mean(f) * 0.1
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
):
    """Route one image through exactly one pipeline and save
    enhanced/illumination/comparison PNGs
    (reference: enhancers/simple_enhance.py:135-199 + the main.py:246
    `adjuster=` keyword, which the reference forgot to accept — fixed here,
    see PARITY.md)."""
    img, _original_size = load_image(image_path, max_size)
    x = jnp.asarray(img)

    start = time.time()
    if classical_mode in ("ssr", "msr", "msrcr", "clahe"):
        enhanced = _classical_enhance(x, classical_mode, use_pallas)
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


def _classical_enhance(x: jnp.ndarray, classical_mode: str, use_pallas):
    """Route the no-net classical pipelines (batched NHWC or single HWC)."""
    if classical_mode == "ssr":
        return ssr_enhance(x)
    if classical_mode == "clahe":
        # Pure Lab-CLAHE (the reference's post-processing step as a standalone
        # enhancer — the BASELINE throughput configuration).
        from retinex_tpu.ops.clahe import clahe_lab_rgb

        return clahe_lab_rgb(x, use_pallas=use_pallas)
    return msr_enhance(x, mode=classical_mode)


def _plan_canvas(path: str, max_size: int | None):
    """Letterbox canvas for one file without decoding pixels (header only)."""
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    target = max_size if max_size is not None else max(h, w)
    plan = plan_letterbox(h, w, target, auto=True, scaleup=False)
    return target, plan


def _decode_bucket(paths: list[str], target: int, out_h: int, out_w: int, num_workers: int):
    """Decode + letterbox a same-canvas bucket to a uint8 NHWC batch —
    C++ pipeline when built (no GIL, libjpeg-turbo), PIL fallback."""
    try:
        from retinex_tpu.data.native_loader import decode_letterbox_batch_canvas, native_available

        if native_available():
            return decode_letterbox_batch_canvas(
                paths, target, out_h, out_w, auto_pad=True, scaleup=False,
                num_threads=num_workers,
            )
    except Exception:
        pass
    from retinex_tpu.data.dataset import decode_image

    imgs = []
    for p in paths:
        rgb = decode_image(p)
        plan = plan_letterbox(rgb.shape[0], rgb.shape[1], target, auto=True, scaleup=False)
        imgs.append(letterbox_np(rgb, plan))
    return np.stack(imgs, axis=0)


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
):
    """Batch enhance over a directory, N frames per device dispatch.

    Unlike the reference's one-image-at-a-time loop
    (enhancers/simple_enhance.py:202-250 — which also skips multi-scale/
    content-aware in batch mode, :81), files are bucketed by letterboxed
    canvas shape and fed to the batched NHWC pipeline `batch_size` at a time:
    C++ threaded decode -> one jitted dispatch per chunk -> threaded PNG
    encode. Returns per-image enhance timings (decode/save excluded, like the
    reference's per-image numbers which also exclude I/O setup).
    """
    from concurrent.futures import ThreadPoolExecutor

    from retinex_tpu.data.dataset import VALID_EXTENSIONS_ENHANCE, list_image_files

    files = list_image_files(input_dir, recursive=False, extensions=VALID_EXTENSIONS_ENHANCE)
    if not files:
        print(f"No images found in {input_dir}")
        return []
    print(f"Found {len(files)} images")

    # Bucket by letterboxed canvas so every chunk is one static jit shape.
    buckets: dict[tuple[int, int, int], list[str]] = {}
    for path in files:
        target, plan = _plan_canvas(path, max_size)
        key = (target, plan.out_h, plan.out_w)
        buckets.setdefault(key, []).append(path)
    print(f"{len(buckets)} shape bucket(s): " + ", ".join(
        f"{h}x{w} x{len(v)}" for (_t, h, w), v in buckets.items()))

    os.makedirs(output_dir, exist_ok=True)
    adjuster = AdaptiveParameterAdjuster()
    saver = ThreadPoolExecutor(max_workers=num_workers) if save_outputs else None
    futures = []
    timings: list[float] = []
    decode_s = save_submit_s = 0.0
    processed = 0

    def save_one(img_f32, enhanced, illu, path):
        name = os.path.splitext(os.path.basename(path))[0]
        save_image(enhanced, os.path.join(output_dir, f"{name}_enhanced.png"))
        save_image(illu, os.path.join(output_dir, f"{name}_illumination.png"))
        create_comparison(
            img_f32, enhanced, save_path=os.path.join(output_dir, f"{name}_comparison.png")
        )

    on_accel = jax.devices()[0].platform != "cpu"

    @functools.lru_cache(maxsize=8)
    def quantized_pipeline(mode, shape):
        """uint8-in -> uint8-out device function: host<->device traffic is
        uint8 both ways (4x less than float — decisive when the accelerator
        sits behind a network tunnel, and still less PCIe in production)."""
        del shape  # distinct cache entries per canvas

        def quant(v):
            return jnp.clip(jnp.round(v * 255.0), 0, 255).astype(jnp.uint8)

        @jax.jit
        def fn(batch_u8):
            from retinex_tpu.ops.clahe_gather import clahe_rgb_u8_gather, gather_supported

            if (
                mode == "clahe"
                and on_accel
                and gather_supported(batch_u8.shape[1], batch_u8.shape[2], 8, 8)
            ):
                return clahe_rgb_u8_gather(batch_u8), None
            x = batch_u8.astype(jnp.float32) / 255.0
            if mode in ("ssr", "msr", "msrcr", "clahe"):
                return quant(_classical_enhance(x, mode, use_pallas)), None
            out, illu = adjuster.apply_adaptive_enhancement(apply_fn, x, use_pallas=use_pallas)
            return quant(out), quant(illu)

        return fn

    mode_key = classical_mode if classical_mode in ("ssr", "msr", "msrcr", "clahe") else "net"

    def drain(pending):
        """Fetch + queue saves for a previously dispatched chunk (software
        pipeline: the device computes the NEXT chunk while this one's results
        stream back and hit the save pool)."""
        nonlocal processed, save_submit_s
        chunk, out_h, out_w, batch_u8, enh_u8, illu_u8, t1 = pending
        enh_np = np.asarray(enh_u8)  # forces execution + u8 download
        t2 = time.time()
        if saver is not None:
            xf = batch_u8.astype(np.float32) / 255.0
            if illu_u8 is not None:  # net mode: the model's illumination map
                illu_np = np.asarray(illu_u8).astype(np.float32) / 255.0
            else:
                # Classical modes: luma stands in for the illumination map
                # (matches enhance_single_image) — computed on host from
                # the already-decoded bytes, zero device traffic.
                illu_np = xf @ np.asarray([0.299, 0.587, 0.114], np.float32)
            for j, path in enumerate(chunk):
                futures.append(
                    saver.submit(
                        save_one,
                        xf[j],
                        enh_np[j].astype(np.float32) / 255.0,
                        illu_np[j],
                        path,
                    )
                )
        save_submit_s += time.time() - t2
        timings.extend([(t2 - t1) / len(chunk)] * len(chunk))
        processed += len(chunk)
        print(
            f"[{processed}/{len(files)}] {out_h}x{out_w} chunk of {len(chunk)}: "
            f"enhance+io {t2 - t1:.3f}s"
        )

    pending = None
    for (target, out_h, out_w), paths in buckets.items():
        fn = quantized_pipeline(mode_key, (out_h, out_w))
        for i in range(0, len(paths), batch_size):
            chunk = paths[i : i + batch_size]
            t0 = time.time()
            batch_u8 = _decode_bucket(chunk, target, out_h, out_w, num_workers)
            t1 = time.time()
            enh_u8, illu_u8 = fn(jnp.asarray(batch_u8))  # async dispatch
            decode_s += t1 - t0
            if pending is not None:
                drain(pending)
            pending = (chunk, out_h, out_w, batch_u8, enh_u8, illu_u8, t1)
    if pending is not None:
        drain(pending)

    if saver is not None:
        for f in futures:
            f.result()
        saver.shutdown()
    total_enh = sum(timings)
    print(
        f"Processed {len(files)} images: enhance {total_enh:.2f}s "
        f"({len(files) / max(total_enh, 1e-9):.1f} img/s), decode {decode_s:.2f}s"
    )
    return timings
