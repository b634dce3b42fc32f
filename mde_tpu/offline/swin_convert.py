"""Convert the mmdet Swin-B Cascade Mask R-CNN checkpoint (the reference's
ADE20K epoch_36.pth / upstream COCO checkpoints) into CascadeMaskRCNN flax
trees. Handles the mmdet key layout:

  backbone.patch_embed.proj / .norm
  backbone.layers.{s}.blocks.{b}.{norm1, attn.qkv, attn.proj,
      attn.relative_position_bias_table, norm2, mlp.fc1, mlp.fc2}
  backbone.layers.{s}.downsample.{reduction, norm}
  backbone.norm{0..3}
  neck.lateral_convs.{i}.conv / neck.fpn_convs.{i}.conv
  rpn_head.rpn_conv / rpn_cls / rpn_reg
  roi_head.bbox_head.{i}.shared_convs.{j}.{conv,bn} / shared_fcs.0 /
      fc_cls / fc_reg
  roi_head.mask_head.{i}.convs.{j}.conv / upsample / conv_logits
"""

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)


def _conv(sd, prefix):
    p = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


def _deconv(sd, prefix):
    """torch ConvTranspose2d (in, out, kH, kW) -> flax ConvTranspose HWIO."""
    p = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 0, 1)}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


def _dense(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).T, "bias": _np(sd[prefix + ".bias"])}


def _ln(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    return ({"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])},
            {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])})


def _torch_cubic(d, a=-0.75):
    """torch's cubic convolution weight at distance d (0 <= d < 2), the
    a=-0.75 Keys kernel F.interpolate(mode='bicubic') uses."""
    d = abs(float(d))
    if d <= 1.0:
        return (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0
    return a * (d**3 - 5.0 * d**2 + 8.0 * d - 4.0)


def _bicubic_matrix(s_in: int, s_out: int):
    """(s_out, s_in) row-stochastic matrix reproducing torch
    F.interpolate(mode='bicubic', align_corners=False) along one axis:
    half-pixel source coords, 4 cubic taps, border taps clamped into range."""
    W = np.zeros((s_out, s_in), np.float64)
    scale = s_in / s_out
    for i in range(s_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        t = x - x0
        for k, w in zip(range(x0 - 1, x0 + 3),
                        (_torch_cubic(1 + t), _torch_cubic(t),
                         _torch_cubic(1 - t), _torch_cubic(2 - t))):
            W[i, min(max(k, 0), s_in - 1)] += w
    return W


def resize_rel_pos_table(table: np.ndarray, target_len: int) -> np.ndarray:
    """Bicubic-resize a (L1, nH) relative_position_bias_table to (L2, nH)
    when window sizes mismatch — the capability the fork's checkpoint loader
    provides (Swin…/mmcv_custom/checkpoint.py:336-353: view (1,nH,S1,S1),
    F.interpolate bicubic to (S2,S2), view back). Separable matmul form."""
    L1, nH = table.shape
    s1, s2 = int(round(L1 ** 0.5)), int(round(target_len ** 0.5))
    assert s1 * s1 == L1 and s2 * s2 == target_len, (L1, target_len)
    W = _bicubic_matrix(s1, s2)
    grid = table.astype(np.float64).reshape(s1, s1, nH)
    out = np.einsum("ab,bch->ach", W, grid)
    out = np.einsum("cd,adh->ach", W, out)
    return out.reshape(target_len, nH).astype(table.dtype)


def convert_swin_backbone(sd, depths=(2, 2, 18, 2), window_size=None):
    """window_size (optional): resize mismatched relative_position_bias_table
    entries to (2*window_size-1)^2 rows, as the fork's loader does when
    loading an ImageNet-pretrained Swin at a different window size."""
    target_len = None if window_size is None else (2 * window_size - 1) ** 2

    def _table(src):
        t = _np(sd[src + ".attn.relative_position_bias_table"])
        if target_len is not None and t.shape[0] != target_len:
            t = resize_rel_pos_table(t, target_len)
        return t

    p = {}
    p["patch_embed_proj"] = _conv(sd, "backbone.patch_embed.proj")
    p["patch_embed_norm"] = _ln(sd, "backbone.patch_embed.norm")
    for s, depth in enumerate(depths):
        for b in range(depth):
            src = f"backbone.layers.{s}.blocks.{b}"
            blk = {
                "norm1": _ln(sd, src + ".norm1"),
                "norm2": _ln(sd, src + ".norm2"),
                "attn": {
                    "qkv": _dense(sd, src + ".attn.qkv"),
                    "proj": _dense(sd, src + ".attn.proj"),
                    "relative_position_bias_table": _table(src),
                },
                "mlp_fc1": _dense(sd, src + ".mlp.fc1"),
                "mlp_fc2": _dense(sd, src + ".mlp.fc2"),
            }
            p[f"stage{s}_block{b}"] = blk
        if s < len(depths) - 1:
            p[f"downsample{s}"] = {
                "norm": _ln(sd, f"backbone.layers.{s}.downsample.norm"),
                "reduction": {"kernel": _np(
                    sd[f"backbone.layers.{s}.downsample.reduction.weight"]).T},
            }
    for s in range(4):
        p[f"out_norm{s}"] = _ln(sd, f"backbone.norm{s}")
    return p


def convert_detector(ckpt_path: str, depths=(2, 2, 18, 2), window_size=None):
    """Full detector checkpoint -> (params, batch_stats) trees matching
    CascadeMaskRCNN's module names."""
    import torch
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))

    params = {"backbone": convert_swin_backbone(sd, depths, window_size)}
    stats = {}

    neck = {}
    for i in range(4):
        neck[f"lateral{i}"] = _conv(sd, f"neck.lateral_convs.{i}.conv")
        neck[f"fpn{i}"] = _conv(sd, f"neck.fpn_convs.{i}.conv")
    params["neck"] = neck

    params["rpn_head"] = {
        "rpn_conv": _conv(sd, "rpn_head.rpn_conv"),
        "rpn_cls": _conv(sd, "rpn_head.rpn_cls"),
        "rpn_reg": _conv(sd, "rpn_head.rpn_reg"),
    }

    for i in range(3):
        src = f"roi_head.bbox_head.{i}"
        hp, hs = {}, {}
        for j in range(4):
            hp[f"shared_conv{j}"] = _conv(sd, f"{src}.shared_convs.{j}.conv")
            hp[f"shared_bn{j}"], hs[f"shared_bn{j}"] = _bn(sd, f"{src}.shared_convs.{j}.bn")
        hp["shared_fc"] = _dense(sd, f"{src}.shared_fcs.0")
        hp["fc_cls"] = _dense(sd, f"{src}.fc_cls")
        hp["fc_reg"] = _dense(sd, f"{src}.fc_reg")
        params[f"bbox_head{i}"] = hp
        stats[f"bbox_head{i}"] = hs

        msrc = f"roi_head.mask_head.{i}"
        mp = {}
        for j in range(4):
            mp[f"conv{j}"] = _conv(sd, f"{msrc}.convs.{j}.conv")
        mp["upsample"] = _deconv(sd, f"{msrc}.upsample")
        mp["conv_logits"] = _conv(sd, f"{msrc}.conv_logits")
        params[f"mask_head{i}"] = mp

    return params, stats
