"""Offline cue-generation pipelines (SURVEY.md §1 L8).

The reference vendors two full PyTorch stacks to generate the cue side files
consumed at train time:
  * semantic-segmentation-pytorch (CSAILVision): HRNetV2-W48 + C1 over NYUD2
    -> semantic_seg_*.npy 150-class label maps
  * Swin-Transformer-Object-Detection (mmdetection fork): Swin-B Cascade Mask
    R-CNN -> instance_{labels,areas}_ade20k_swin*.npz

Here both are JAX/flax inference pipelines sharing the framework's ops
(half-pixel resizes as MXU matmuls, NHWC, bf16-capable) plus converters for
the published torch checkpoints.
"""

from .hrnet import HRNetV2C1, hrnet_multiscale_inference

__all__ = ["HRNetV2C1", "hrnet_multiscale_inference"]
