"""retinex_tpu: TPU-native unsupervised low-light image enhancement framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
UP-Retinex reference (xh92117/Retinex-image-Enhancement):

- ``retinex_tpu.models``   — Flax NHWC model family (FAM, Res/PreAct blocks, ASPP,
  illumination-estimation encoder-decoder, multi-scale Retinex head).
- ``retinex_tpu.losses``   — the 7-term unsupervised loss mix as pure jittable
  functions (exposure, edge-aware TV smoothness, color constancy, spatial
  consistency, illumination/reflectance decoupling, VGG perceptual, FFT frequency),
  with dynamic texture-complexity smooth weighting and DWA adaptive weights.
- ``retinex_tpu.ops``      — TPU-first image ops: colorspace (Rec.601 gray, CIELab),
  separable filters, letterbox, CLAHE (jnp reference + Pallas tile-histogram
  kernel), classical SSR/MSR log-domain Retinex, image-quality metrics.
- ``retinex_tpu.infer``    — jitted predict + classical-assisted enhance pipelines
  (adaptive CLAHE, pyramid multi-scale, saliency content-aware).
- ``retinex_tpu.data``     — host-side input pipeline (decode, letterbox, augment)
  feeding sharded device batches.
- ``retinex_tpu.parallel`` — mesh/sharding helpers for data-parallel training over ICI.
- ``retinex_tpu.train``    — jitted train step (bf16), optimizer/schedulers, early
  stopping, Orbax checkpointing, TensorBoard/CSV observability.

Reference behavior citations throughout point into the upstream snapshot at
/root/reference (file:line).
"""

__version__ = "0.1.0"
