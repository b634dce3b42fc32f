"""Checkpoint I/O: orbax save/load with latest/best retention + torch import.

Replaces reference model_io.py:15-72 (torch.save of {model, optimizer, epoch},
`module.` prefix stripping, legacy key renames). Orbax writes the whole
TrainState pytree (params, batch_stats, optimizer state, step), sharded-aware
and async-capable; `load_torch_checkpoint` converts a reference .pt file into
this framework's parameter tree so published AdaBins/reference checkpoints
remain usable (the converter handles the reference's DDP `module.` prefixes
and the two legacy mViT key renames at model_io.py:54-69).
"""

import os
import re
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


# ----------------------------------------------------------------- orbax side

_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(state, epoch: int, filename: str, root: str = "./checkpoints",
                    async_save: bool = False):
    """Write the TrainState under root/filename (a directory). Mirrors
    save_checkpoint(model, optimizer, epoch, filename, root) at
    reference model_io.py:15-26.

    With async_save=True the disk write happens on orbax's background thread
    (the device->host fetch is still synchronous), so training's next
    dispatch window overlaps the serialization. Call wait_for_checkpoints()
    before reading the file back or exiting."""
    os.makedirs(root, exist_ok=True)
    path = os.path.abspath(os.path.join(root, filename))
    ckpt = {"state": jax.device_get(state), "epoch": epoch}
    if async_save:
        _async_checkpointer().save(path, ckpt, force=True)
    else:
        ocp.PyTreeCheckpointer().save(path, ckpt, force=True)
    return path


def wait_for_checkpoints():
    """Block until every async save has committed (no-op otherwise)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(fpath: str, state=None):
    """Restore (state, epoch). With a template `state`, restores into its
    structure (so shardings/dtypes are preserved)."""
    ckptr = ocp.PyTreeCheckpointer()
    if state is not None:
        template = {"state": jax.device_get(state), "epoch": 0}
        restored = ckptr.restore(os.path.abspath(fpath), item=template)
    else:
        restored = ckptr.restore(os.path.abspath(fpath))
    return restored["state"], restored["epoch"]


# ----------------------------------------------------------- torch conversion

def _to_np(t):
    return np.asarray(t.detach().cpu().numpy())


def _strip_prefixes(sd: dict) -> dict:
    """DDP `module.` strip + legacy mViT renames (reference model_io.py:44-69)."""
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        k = k.replace("adaptive_bins_layer.embedding_conv.",
                      "adaptive_bins_layer.conv3x3.")
        k = k.replace("adaptive_bins_layer.patch_transformer.embedding_encoder",
                      "adaptive_bins_layer.patch_transformer.embedding_convPxP")
        out[k] = v
    return out


def _conv_kernel(w) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return _to_np(w).transpose(2, 3, 1, 0)


def _dw_conv_kernel(w) -> np.ndarray:
    """torch depthwise (C,1,H,W) -> flax HWIO with feature_group_count=C:
    flax expects (H, W, in/groups=1, C)."""
    return _to_np(w).transpose(2, 3, 1, 0)


def _bn(sd, prefix):
    return {
        "scale": _to_np(sd[prefix + ".weight"]),
        "bias": _to_np(sd[prefix + ".bias"]),
    }, {
        "mean": _to_np(sd[prefix + ".running_mean"]),
        "var": _to_np(sd[prefix + ".running_var"]),
    }


def _conv(sd, prefix, depthwise=False):
    p = {"kernel": _dw_conv_kernel(sd[prefix + ".weight"]) if depthwise
         else _conv_kernel(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = _to_np(sd[prefix + ".bias"])
    return p


def _dense(sd, prefix):
    return {"kernel": _to_np(sd[prefix + ".weight"]).T,
            "bias": _to_np(sd[prefix + ".bias"])}


def convert_backbone_statedict(sd: dict, arch: str):
    """gen-efficientnet tf_efficientnet_{b1,b5}_ap state dict -> flax
    EfficientNetEncoder params/batch_stats trees.

    Handles both the raw hub layout (conv_stem.*, blocks.{s}.{r}.*) and the
    reference checkpoint layout (encoder.original_model.* after prefix strip).
    """
    from .models.efficientnet import _B0_STAGES, EFFICIENTNET_CONFIGS, round_repeats

    sd = { (k[len("encoder.original_model."):] if k.startswith("encoder.original_model.") else k): v
           for k, v in sd.items() }

    width, depth = EFFICIENTNET_CONFIGS[arch]
    params, stats = {}, {}

    params["conv_stem"] = _conv(sd, "conv_stem")
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    for stage_i, (expand, _k, _s, _c, base_r) in enumerate(_B0_STAGES):
        repeats = round_repeats(base_r, depth)
        for rep in range(repeats):
            src = f"blocks.{stage_i}.{rep}"
            dst = f"blocks_{stage_i}_{rep}"
            p, st = {}, {}
            if expand == 1:
                p["conv_dw"] = _conv(sd, src + ".conv_dw", depthwise=True)
                p["bn1"], st["bn1"] = _bn(sd, src + ".bn1")
                p["se"] = {"conv_reduce": _conv(sd, src + ".se.conv_reduce"),
                           "conv_expand": _conv(sd, src + ".se.conv_expand")}
                p["conv_pw"] = _conv(sd, src + ".conv_pw")
                p["bn2"], st["bn2"] = _bn(sd, src + ".bn2")
            else:
                p["conv_pw"] = _conv(sd, src + ".conv_pw")
                p["bn1"], st["bn1"] = _bn(sd, src + ".bn1")
                p["conv_dw"] = _conv(sd, src + ".conv_dw", depthwise=True)
                p["bn2"], st["bn2"] = _bn(sd, src + ".bn2")
                p["se"] = {"conv_reduce": _conv(sd, src + ".se.conv_reduce"),
                           "conv_expand": _conv(sd, src + ".se.conv_expand")}
                p["conv_pwl"] = _conv(sd, src + ".conv_pwl")
                p["bn3"], st["bn3"] = _bn(sd, src + ".bn3")
            params[dst] = p
            stats[dst] = st

    params["conv_head"] = _conv(sd, "conv_head")
    params["bn2"], stats["bn2"] = _bn(sd, "bn2")
    return params, stats


def _upsample_block(sd, prefix):
    """UpSampleBN torch Sequential [conv, bn, lrelu, conv, bn, lrelu] ->
    flax {conv_a, bn_a, conv_b, bn_b}."""
    p, st = {}, {}
    p["conv_a"] = _conv(sd, prefix + "._net.0")
    p["bn_a"], st["bn_a"] = _bn(sd, prefix + "._net.1")
    p["conv_b"] = _conv(sd, prefix + "._net.3")
    p["bn_b"], st["bn_b"] = _bn(sd, prefix + "._net.4")
    return p, st


def convert_reference_checkpoint(fpath: str, encoder_name: str = "efficientnet-b1"):
    """Full reference .pt checkpoint -> (params, batch_stats) trees for
    UnetAdaptiveBins. Requires torch (CPU) at conversion time only."""
    import torch

    ckpt = torch.load(fpath, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = _strip_prefixes(sd)

    arch = "efficientnet-b5" if "efficientnet-b5" in encoder_name else "efficientnet-b1"
    params, stats = {}, {}

    enc_sd = {k[len("encoder.original_model."):]: v for k, v in sd.items()
              if k.startswith("encoder.original_model.")}
    params["encoder"], stats["encoder"] = convert_backbone_statedict(enc_sd, arch)

    # decoder
    dp, dst = {}, {}
    dp["conv2"] = _conv(sd, "decoder.conv2")
    for i in range(1, 5):
        dp[f"up{i}"], dst[f"up{i}"] = _upsample_block(sd, f"decoder.up{i}")
    dp["conv3"] = _conv(sd, "decoder.conv3")
    params["decoder"], stats["decoder"] = dp, dst

    if "noAdaBins" not in encoder_name:
        ab, pt = {}, {}
        pt["embedding_convPxP"] = _conv(sd, "adaptive_bins_layer.patch_transformer.embedding_convPxP")
        pt["positional_encodings"] = _to_np(sd["adaptive_bins_layer.patch_transformer.positional_encodings"])
        for i in range(4):
            src = f"adaptive_bins_layer.patch_transformer.transformer_encoder.layers.{i}"
            in_w = _to_np(sd[src + ".self_attn.in_proj_weight"])
            in_b = _to_np(sd[src + ".self_attn.in_proj_bias"])
            layer = {
                "self_attn": {
                    "in_proj": {"kernel": in_w.T, "bias": in_b},
                    "out_proj": _dense(sd, src + ".self_attn.out_proj"),
                },
                "linear1": _dense(sd, src + ".linear1"),
                "linear2": _dense(sd, src + ".linear2"),
                "norm1": {"scale": _to_np(sd[src + ".norm1.weight"]),
                          "bias": _to_np(sd[src + ".norm1.bias"])},
                "norm2": {"scale": _to_np(sd[src + ".norm2.weight"]),
                          "bias": _to_np(sd[src + ".norm2.bias"])},
            }
            pt[f"layer_{i}"] = layer
        ab["patch_transformer"] = pt
        ab["conv3x3"] = _conv(sd, "adaptive_bins_layer.conv3x3")
        for i, src_i in enumerate((0, 2, 4)):
            ab[f"regressor_{i}"] = _dense(sd, f"adaptive_bins_layer.regressor.{src_i}")
        params["adaptive_bins_layer"] = ab
        params["conv_out"] = _conv(sd, "conv_out.0")

    for name in ("semantics_areas_fc", "semantics_absolute_sizes_fc",
                 "instance_areas_fc", "instance_absolute_sizes_fc"):
        if name + ".0.weight" in sd:
            params[name] = {"fc0": _conv(sd, name + ".0"),
                            "fc1": _conv(sd, name + ".2")}

    return params, stats


def save_backbone_npz(params, stats, out_path: str):
    """Flatten converted backbone trees into an .npz for --pretrained_backbone."""
    flat = {}

    def walk(tree, prefix, bucket):
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                walk(v, key + "/", bucket)
            else:
                flat[f"{bucket}:{key}"] = v

    walk(params, "", "params")
    walk(stats, "", "stats")
    np.savez_compressed(out_path, **flat)


def load_backbone_npz(path: str):
    """Inverse of save_backbone_npz: .npz -> (params, stats) nested trees."""
    data = np.load(path)
    params, stats = {}, {}
    for key in data.files:
        bucket, rest = key.split(":", 1)
        tree = params if bucket == "params" else stats
        parts = rest.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return params, stats
