"""UnetAdaptiveBins: EfficientNet encoder -> UNet decoder -> mViT bins head,
with biological-cue insertion (reference models/unet_adaptive_bins.py:119-395).

NHWC throughout; cue channels ride the trailing axis. Differences from the
reference are deliberate TPU-first choices, not behavioral drift:

* TF-'SAME' stem padding is native lax conv padding (the reference hand-rolls
  it at unet_adaptive_bins.py:11-36).
* Cue-channel surgery at insertion_point='input' is just a wider stem conv;
  pretrained RGB kernels are slotted into input channels 0:3 by the
  checkpoint converter (reference mutates the torch module in place at
  :333-354).
* `before-attn` + semantics human-sizes raises a clear error: the reference
  concatenates those channels onto the *input* tensor by mistake
  (unet_adaptive_bins.py:256-259), which crashes at the mViT with a channel
  mismatch — every shipped params file uses insertion_point=input for
  human-sizes, so no working configuration is lost.

Outputs: (bin_edges (N, n_bins+1) | None, pred (N, h/2, w/2, 1)).
"""

import sys
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.bins import bin_edges_from_widths, bin_centers, depth_from_bins
from ..ops.resize import resize_nearest
from .decoder import DecoderBN
from .efficientnet import EfficientNetEncoder
from .mvit import MViT


class _ConvOutParams(nn.Module):
    """Parameters of the 'conv_out' 1x1 conv, declared without the conv so the
    fused Pallas bins-head kernel can consume them directly. Param names,
    shapes, and initializers match nn.Conv exactly — checkpoints are
    interchangeable between the fused and unfused paths."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def get_num_channels_to_add(encoder_name: str, semantics_mode: Optional[str],
                            instance_segmentation_mode: Optional[str],
                            image: str) -> int:
    """Channel-count contract for cue insertion
    (reference unet_adaptive_bins.py:363-395)."""
    num = 0
    if semantics_mode is not None:
        if "raw" in semantics_mode:
            num += 1
        elif semantics_mode == "glove":
            num += 300
        elif "glove-25d" in semantics_mode:
            num += 25
        else:
            sys.exit("Error [mde_tpu/models/unet_adaptive_bins.py]: semantics mode not recognised")
        if "inst-areas" in semantics_mode:
            num += 10
        if "human-sizes" in semantics_mode:
            num += 10
    if instance_segmentation_mode is not None:
        if instance_segmentation_mode == "raw":
            num += 1
        elif instance_segmentation_mode == "coco" or "ade20k_swin" in instance_segmentation_mode:
            num += 35  # 25 label-embedding channels + 10 processed-area channels
        if "human_sizes" in instance_segmentation_mode:
            num += 10
    return num


class CueMLP(nn.Module):
    """1x1-conv MLP for area / size cue channels: C->10->10 with ReLU
    (reference unet_adaptive_bins.py:146-174)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(10, (1, 1), name="fc0", dtype=self.dtype)(x.astype(self.dtype))
        y = nn.relu(y)
        y = nn.Conv(10, (1, 1), name="fc1", dtype=self.dtype)(y)
        return nn.relu(y)


class UnetAdaptiveBins(nn.Module):
    n_bins: int = 100
    min_val: float = 0.1
    max_val: float = 10.0
    norm: str = "linear"
    encoder_name: str = "efficientnet-b5"
    semantics_mode: Optional[str] = None
    instance_segmentation_mode: Optional[str] = None
    insertion_point: str = "before-attn"
    image: str = "rgb"
    remat: str = "none"            # "none" | "encoder" — activation ckpt policy
    hires_impl: str = "native"     # encoder high-res layout: "native" | "packed"
    fused_head: bool = False       # Pallas conv+softmax+centers head (TPU only)
    mesh: Any = None               # device mesh; shard_maps the fused head
    # over its 'data' axis (GSPMD can't partition a Mosaic custom call)
    dtype: Any = jnp.float32

    def _arch(self) -> str:
        return "efficientnet-b5" if "efficientnet-b5" in self.encoder_name else "efficientnet-b1"

    @property
    def no_adabins(self) -> bool:
        return "noAdaBins" in self.encoder_name

    @nn.compact
    def __call__(self, x, semantics=None, instance_labels=None, instance_areas=None,
                 train: bool = False):
        """All inputs NHWC. `semantics` carries embedding (+area/size) channels,
        `instance_labels` embedding channels, `instance_areas` area (+3 size)
        channels, exactly as the cue loaders emit them."""
        sem_mode = self.semantics_mode
        inst_mode = self.instance_segmentation_mode
        deterministic = not train

        if self.insertion_point == "input":
            if semantics is not None:
                if sem_mode == "glove-25d-inst-areas":
                    x = jnp.concatenate([x, semantics[..., 0:25]], axis=-1)
                    areas = CueMLP(self.dtype, name="semantics_areas_fc")(semantics[..., 25:26])
                    x = jnp.concatenate([x, areas], axis=-1)
                elif sem_mode is not None and "human-sizes" in sem_mode:
                    x = jnp.concatenate([x, semantics[..., :-3]], axis=-1)
                    sizes = CueMLP(self.dtype, name="semantics_absolute_sizes_fc")(semantics[..., -3:])
                    x = jnp.concatenate([x, sizes], axis=-1)
                else:
                    x = jnp.concatenate([x, semantics], axis=-1)
            if instance_labels is not None:
                x = jnp.concatenate([x, instance_labels], axis=-1)
            if instance_areas is not None:
                if inst_mode is not None and "human_sizes" in inst_mode:
                    a = instance_areas[..., 0:1] / (x.shape[1] * x.shape[2])
                    a = CueMLP(self.dtype, name="instance_areas_fc")(a)
                    x = jnp.concatenate([x, a], axis=-1)
                    s = CueMLP(self.dtype, name="instance_absolute_sizes_fc")(instance_areas[..., 1:4])
                    x = jnp.concatenate([x, s], axis=-1)
                else:
                    a = instance_areas / (x.shape[1] * x.shape[2])
                    a = CueMLP(self.dtype, name="instance_areas_fc")(a)
                    x = jnp.concatenate([x, a], axis=-1)

        if self.image == "none":
            if x.shape[-1] <= 3:
                raise ValueError("Error: Add more auxiliary information at input if using no image")
            x = x[..., 3:]

        features = EfficientNetEncoder(self._arch(), dtype=self.dtype,
                                       remat=self.remat == "encoder",
                                       hires_impl=self.hires_impl,
                                       name="encoder")(x.astype(self.dtype), train=train)
        num_features = 2048 if self._arch() == "efficientnet-b5" else 1280
        unet_out = DecoderBN(num_features=num_features, num_classes=128,
                             mode="noAdaBins" if self.no_adabins else "AdaBins",
                             dtype=self.dtype,
                             name="decoder")(features, train=train)

        if self.no_adabins:
            # Direct depth head; ReLU + eps keeps SILog finite
            # (reference unet_adaptive_bins.py:240-242).
            return None, nn.relu(unet_out.astype(jnp.float32)) + 1e-4

        if self.insertion_point == "before-attn":
            hw = unet_out.shape[1:3]
            if semantics is not None:
                sem = resize_nearest(semantics, hw)
                if sem_mode == "glove-25d-inst-areas":
                    unet_out = jnp.concatenate([unet_out, sem[..., 0:25].astype(self.dtype)], axis=-1)
                    areas = CueMLP(self.dtype, name="semantics_areas_fc")(sem[..., 25:26])
                    unet_out = jnp.concatenate([unet_out, areas], axis=-1)
                elif sem_mode is not None and "human-sizes" in sem_mode:
                    raise ValueError(
                        "semantics human-sizes with insertion_point='before-attn' is not a "
                        "working configuration in the reference (the cue channels are "
                        "concatenated onto an unused tensor at unet_adaptive_bins.py:256-259 "
                        "and the mViT channel count mismatches); use insertion_point='input'.")
                else:
                    unet_out = jnp.concatenate([unet_out, sem.astype(self.dtype)], axis=-1)
            if instance_labels is not None:
                lab = resize_nearest(instance_labels, hw)
                unet_out = jnp.concatenate([unet_out, lab.astype(self.dtype)], axis=-1)
            if instance_areas is not None:
                ar = resize_nearest(instance_areas, hw)
                if inst_mode is not None and "human_sizes" in inst_mode:
                    a = ar[..., 0:1] / (x.shape[1] * x.shape[2])
                    a = CueMLP(self.dtype, name="instance_areas_fc")(a)
                    unet_out = jnp.concatenate([unet_out, a], axis=-1)
                    s = CueMLP(self.dtype, name="instance_absolute_sizes_fc")(ar[..., 1:4])
                    unet_out = jnp.concatenate([unet_out, s], axis=-1)
                else:
                    a = ar / (x.shape[1] * x.shape[2])
                    a = CueMLP(self.dtype, name="instance_areas_fc")(a)
                    unet_out = jnp.concatenate([unet_out, a], axis=-1)

        bin_widths_normed, range_attention_maps = MViT(
            n_query_channels=128, patch_size=16, dim_out=self.n_bins,
            embedding_dim=128, norm=self.norm, dtype=self.dtype,
            name="adaptive_bins_layer")(unet_out, deterministic)

        bin_edges = bin_edges_from_widths(bin_widths_normed, self.min_val, self.max_val)
        centers = bin_centers(bin_edges)

        _, h, w, cin = range_attention_maps.shape
        from ..kernels.bins_head import fused_head_supported
        from ..kernels.sharded import fused_bins_head_sharded
        if self.fused_head and cin == 128 and fused_head_supported(h, w, self.n_bins):
            kernel, bias = _ConvOutParams(self.n_bins, cin, name="conv_out")()
            pred = fused_bins_head_sharded(range_attention_maps, kernel, bias,
                                           centers, mesh=self.mesh)
        else:
            out = nn.Conv(self.n_bins, (1, 1), name="conv_out", dtype=self.dtype)(range_attention_maps)
            out = nn.softmax(out.astype(jnp.float32), axis=-1)
            pred = depth_from_bins(out, centers)
        return bin_edges, pred


def _fused_head_available(args, mesh):
    """--use_fused_head, gated on the backend: Mosaic kernels are TPU-only, so
    on cpu/gpu the fused head only runs when a test forces the interpreter
    (kernels/bins_head.py FORCE_INTERPRET). Centralized here so every
    build_model caller (train driver, evaluate, probes, tests) gets the same
    behavior now that the flag defaults on."""
    if not bool(getattr(args, "use_fused_head", False)):
        return False
    if mesh is not None:
        import numpy as np
        platform = np.asarray(mesh.devices).flat[0].platform
    else:
        import jax
        platform = jax.devices()[0].platform
    if platform in ("cpu", "gpu"):
        from ..kernels import bins_head as _bins_head_mod
        return _bins_head_mod.FORCE_INTERPRET
    return True


def build_model(args, n_bins=None, dtype=jnp.float32, mesh=None) -> UnetAdaptiveBins:
    """Construct the model from a parsed args namespace (the reference's
    UnetAdaptiveBins.build surface, unet_adaptive_bins.py:315-360, minus
    torch.hub fetching — pretrained weights come from the checkpoint
    converter instead). Pass the device mesh when training sharded with
    --use_fused_head so the Pallas head runs per-shard (kernels/sharded.py)."""
    return UnetAdaptiveBins(
        n_bins=n_bins if n_bins is not None else args.n_bins,
        min_val=args.min_depth, max_val=args.max_depth,
        norm=getattr(args, "norm", "linear"),
        encoder_name=args.encoder_name,
        semantics_mode=args.use_semantics,
        instance_segmentation_mode=args.use_instance_segmentation,
        insertion_point=args.insertion_point,
        image=args.image,
        remat=getattr(args, "remat", "none") or "none",
        hires_impl=getattr(args, "hires_impl", "native") or "native",
        fused_head=_fused_head_available(args, mesh),
        mesh=mesh,
        dtype=dtype,
    )
