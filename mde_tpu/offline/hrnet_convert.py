"""Convert CSAILVision HRNetV2-W48 + C1 torch checkpoints
(encoder_epoch_N.pth / decoder_epoch_N.pth) into HRNetV2C1 flax trees."""

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)


def _conv(sd, prefix):
    p = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


def _bn(sd, prefix):
    return ({"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])},
            {"mean": _np(sd[prefix + ".running_mean"]), "var": _np(sd[prefix + ".running_var"])})


def _basic_block(sd, prefix):
    p, s = {}, {}
    for i in (1, 2):
        p[f"conv{i}"] = _conv(sd, f"{prefix}.conv{i}")
        p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
    return p, s


def _bottleneck(sd, prefix, has_downsample):
    p, s = {}, {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = _conv(sd, f"{prefix}.conv{i}")
        p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
    if has_downsample:
        p["downsample_conv"] = _conv(sd, f"{prefix}.downsample.0")
        p["downsample_bn"], s["downsample_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return p, s


_STAGES = {2: (1, 2), 3: (4, 3), 4: (3, 4)}  # stage: (modules, branches)


def convert_hrnet_encoder(sd: dict):
    """torch HRNetV2 state dict -> (params, batch_stats) for HRNetV2Trunk."""
    p, s = {}, {}
    p["conv1"] = _conv(sd, "conv1")
    p["bn1"], s["bn1"] = _bn(sd, "bn1")
    p["conv2"] = _conv(sd, "conv2")
    p["bn2"], s["bn2"] = _bn(sd, "bn2")

    for b in range(4):
        p[f"layer1_block{b}"], s[f"layer1_block{b}"] = _bottleneck(
            sd, f"layer1.{b}", has_downsample=(b == 0))

    # transition1 (hrnet.py:309-343): branch 0 reshapes channels in place
    # (Sequential(conv, bn, relu) -> keys .0/.1); branch 1 is a NEW
    # downsampling branch, i.e. a length-1 chain of Sequentials exactly like
    # transition2/3's new branches -> keys .0.0/.0.1. Round 2 mapped branch 1
    # flat (.0/.1) — caught by test_offline_converter_parity.
    p["transition1_0_conv"] = _conv(sd, "transition1.0.0")
    p["transition1_0_bn"], s["transition1_0_bn"] = _bn(sd, "transition1.0.1")
    p["transition1_1_conv"] = _conv(sd, "transition1.1.0.0")
    p["transition1_1_bn"], s["transition1_1_bn"] = _bn(sd, "transition1.1.0.1")

    # transition2/3: only the new branch (chain of length 1: index .0)
    for t, new_branch in ((2, 2), (3, 3)):
        p[f"transition{t}_{new_branch}_conv"] = _conv(sd, f"transition{t}.{new_branch}.0.0")
        (p[f"transition{t}_{new_branch}_bn"],
         s[f"transition{t}_{new_branch}_bn"]) = _bn(sd, f"transition{t}.{new_branch}.0.1")

    for stage, (modules, branches) in _STAGES.items():
        for m in range(modules):
            mp, ms = {}, {}
            src = f"stage{stage}.{m}"
            for br in range(branches):
                for blk in range(4):
                    (mp[f"branch{br}_block{blk}"],
                     ms[f"branch{br}_block{blk}"]) = _basic_block(
                        sd, f"{src}.branches.{br}.{blk}")
            for i in range(branches):
                for j in range(branches):
                    if j == i:
                        continue
                    if j > i:
                        mp[f"fuse{i}_{j}_conv"] = _conv(sd, f"{src}.fuse_layers.{i}.{j}.0")
                        (mp[f"fuse{i}_{j}_bn"],
                         ms[f"fuse{i}_{j}_bn"]) = _bn(sd, f"{src}.fuse_layers.{i}.{j}.1")
                    else:
                        for k in range(i - j):
                            mp[f"fuse{i}_{j}_conv{k}"] = _conv(
                                sd, f"{src}.fuse_layers.{i}.{j}.{k}.0")
                            (mp[f"fuse{i}_{j}_bn{k}"],
                             ms[f"fuse{i}_{j}_bn{k}"]) = _bn(
                                sd, f"{src}.fuse_layers.{i}.{j}.{k}.1")
            p[f"stage{stage}_module{m}"] = mp
            s[f"stage{stage}_module{m}"] = ms
    return p, s


def convert_resnet_encoder(sd: dict, basic: bool = False):
    """torch CSAIL ResNet/ResNeXt state dict -> (params, batch_stats) for
    semseg_zoo.ResNetEncoder.

    Covers the deep 3x3x3 stem plus layer1..layer4 of both the bottleneck
    form (mit_semseg/models/resnet.py) and the grouped GroupBottleneck form
    (mit_semseg/models/resnext.py:23-59 — grouped conv weights are
    (out, in/groups, kh, kw) in torch and (kh, kw, in/groups, out) in flax,
    so the same transpose applies). ``basic=True`` maps resnet18's 2-conv
    BasicBlock.
    """
    p, s = {}, {}
    for i in (1, 2, 3):
        p[f"stem_conv{i}"] = _conv(sd, f"conv{i}")
        p[f"stem_bn{i}"], s[f"stem_bn{i}"] = _bn(sd, f"bn{i}")
    for stage in range(1, 5):
        b = 0
        while f"layer{stage}.{b}.conv1.weight" in sd:
            prefix = f"layer{stage}.{b}"
            has_ds = f"{prefix}.downsample.0.weight" in sd
            if basic:
                bp, bs = _basic_block(sd, prefix)
                if has_ds:
                    bp["downsample_conv"] = _conv(sd, f"{prefix}.downsample.0")
                    bp["downsample_bn"], bs["downsample_bn"] = _bn(
                        sd, f"{prefix}.downsample.1")
            else:
                bp, bs = _bottleneck(sd, prefix, has_ds)
            p[f"layer{stage}_block{b}"] = bp
            s[f"layer{stage}_block{b}"] = bs
            b += 1
    return p, s


def convert_hrnet_c1(encoder_path: str, decoder_path: str):
    """Paths to CSAIL encoder/decoder .pth -> full HRNetV2C1 (params, stats)."""
    import torch
    enc_sd = torch.load(encoder_path, map_location="cpu", weights_only=False)
    dec_sd = torch.load(decoder_path, map_location="cpu", weights_only=False)

    enc_p, enc_s = convert_hrnet_encoder(enc_sd)
    params = {"encoder": enc_p}
    stats = {"encoder": enc_s}
    params["cbr_conv"] = _conv(dec_sd, "cbr.0")
    params["cbr_bn"], stats["cbr_bn"] = _bn(dec_sd, "cbr.1")
    params["conv_last"] = _conv(dec_sd, "conv_last")
    return params, stats
