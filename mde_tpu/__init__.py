"""mde_tpu — TPU-native monocular depth estimation with biological-vision cues.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
DylanAuty/MDE-biological-vision-systems (ICPR 2022, an AdaBins fork):
dense depth from a single RGB image, optionally concatenating per-pixel
"biological cues" (semantic-class word embeddings, per-instance visual areas,
human-provided absolute object sizes) at the network input or before the
adaptive-bins attention head.

Layout (bottom-up, mirroring the reference's layer map in SURVEY.md §1):
  ops/       resize / bin math / losses / metrics — pure jnp + Pallas-backed
  kernels/   Pallas TPU kernels for the hot ops
  models/    EfficientNet encoder, UNet decoder, miniViT bins head (flax, NHWC)
  cues/      device-side embedding gathers replacing the ExternalInfoLoaders
  data/      NYUD2/KITTI pipeline: decode, augment, host->HBM prefetch
  parallel/  mesh + sharding helpers (DDP == batch sharding under jit)
  train/     optimizer (AdamW 2-group + OneCycle), train/validate loops
  config/    argparse front-end byte-compatible with the reference params/*.txt
  utils/     metrics aggregation, colorize, experiment dirs, TB logging
  offline/   cue-generation pipelines (HRNetV2 semseg, Swin Cascade Mask R-CNN)
"""

__version__ = "0.1.0"
