"""Reference .pt checkpoint converter tests: a procedurally-built torch state
dict with the reference layout (gen-efficientnet backbone naming + decoder /
adaptive_bins_layer / conv_out modules, DDP prefixes, legacy key aliases) must
convert into exactly the flax init tree of UnetAdaptiveBins."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")  # skip cleanly where torch is absent

from mde_tpu.models import UnetAdaptiveBins
from mde_tpu.models.efficientnet import (_B0_STAGES, EFFICIENTNET_CONFIGS,
                                         round_channels, round_repeats)
from mde_tpu.checkpoint import convert_reference_checkpoint


def _conv_keys(sd, prefix, cin, cout, k, bias=False, groups=1):
    sd[prefix + ".weight"] = torch.zeros(cout, cin // groups, k, k)
    if bias:
        sd[prefix + ".bias"] = torch.zeros(cout)


def _bn_keys(sd, prefix, c):
    sd[prefix + ".weight"] = torch.ones(c)
    sd[prefix + ".bias"] = torch.zeros(c)
    sd[prefix + ".running_mean"] = torch.zeros(c)
    sd[prefix + ".running_var"] = torch.ones(c)


def _dense_keys(sd, prefix, cin, cout):
    sd[prefix + ".weight"] = torch.zeros(cout, cin)
    sd[prefix + ".bias"] = torch.zeros(cout)


def build_reference_statedict(n_bins=80, ddp_prefix=True):
    """B1 AdaBins state dict in the reference layout (with module. prefixes
    and the legacy embedding_conv alias to exercise model_io-compat paths)."""
    sd = {}
    width, depth = EFFICIENTNET_CONFIGS["efficientnet-b1"]
    enc = "encoder.original_model."
    _conv_keys(sd, enc + "conv_stem", 3, 32, 3)
    _bn_keys(sd, enc + "bn1", 32)
    in_ch = 32
    for s, (expand, k, stride, base_c, base_r) in enumerate(_B0_STAGES):
        out_ch = round_channels(base_c, width)
        for r in range(round_repeats(base_r, depth)):
            pre = f"{enc}blocks.{s}.{r}"
            se_red = max(1, int(in_ch * 0.25))
            if expand == 1:
                _conv_keys(sd, pre + ".conv_dw", in_ch, in_ch, k, groups=in_ch)
                _bn_keys(sd, pre + ".bn1", in_ch)
                _conv_keys(sd, pre + ".se.conv_reduce", in_ch, se_red, 1, bias=True)
                _conv_keys(sd, pre + ".se.conv_expand", se_red, in_ch, 1, bias=True)
                _conv_keys(sd, pre + ".conv_pw", in_ch, out_ch, 1)
                _bn_keys(sd, pre + ".bn2", out_ch)
            else:
                mid = in_ch * expand
                _conv_keys(sd, pre + ".conv_pw", in_ch, mid, 1)
                _bn_keys(sd, pre + ".bn1", mid)
                _conv_keys(sd, pre + ".conv_dw", mid, mid, k, groups=mid)
                _bn_keys(sd, pre + ".bn2", mid)
                _conv_keys(sd, pre + ".se.conv_reduce", mid, se_red, 1, bias=True)
                _conv_keys(sd, pre + ".se.conv_expand", se_red, mid, 1, bias=True)
                _conv_keys(sd, pre + ".conv_pwl", mid, out_ch, 1)
                _bn_keys(sd, pre + ".bn3", out_ch)
            in_ch = out_ch
    _conv_keys(sd, enc + "conv_head", in_ch, 1280, 1)
    _bn_keys(sd, enc + "bn2", 1280)

    # decoder (torch channel bookkeeping per reference unet_adaptive_bins.py:56-80)
    f = 1280
    _conv_keys(sd, "decoder.conv2", 1280, f, 1, bias=True)
    skips = [112, 40, 24, 16]
    for i in range(1, 5):
        cin = f // (2 ** (i - 1)) + skips[i - 1]
        cout = f // (2 ** i)
        _conv_keys(sd, f"decoder.up{i}._net.0", cin, cout, 3, bias=True)
        _bn_keys(sd, f"decoder.up{i}._net.1", cout)
        _conv_keys(sd, f"decoder.up{i}._net.3", cout, cout, 3, bias=True)
        _bn_keys(sd, f"decoder.up{i}._net.4", cout)
    _conv_keys(sd, "decoder.conv3", f // 16, 128, 3, bias=True)

    # mViT — use the LEGACY alias names for conv3x3/embedding to exercise the
    # model_io.py:54-69 rename path
    _conv_keys(sd, "adaptive_bins_layer.embedding_conv", 128, 128, 16, bias=True)
    pt = "adaptive_bins_layer.patch_transformer."
    sd[pt + "positional_encodings"] = torch.zeros(500, 128)
    for i in range(4):
        layer = f"{pt}transformer_encoder.layers.{i}"
        sd[layer + ".self_attn.in_proj_weight"] = torch.zeros(384, 128)
        sd[layer + ".self_attn.in_proj_bias"] = torch.zeros(384)
        _dense_keys(sd, layer + ".self_attn.out_proj", 128, 128)
        _dense_keys(sd, layer + ".linear1", 128, 1024)
        _dense_keys(sd, layer + ".linear2", 1024, 128)
        for nrm in ("norm1", "norm2"):
            sd[f"{layer}.{nrm}.weight"] = torch.ones(128)
            sd[f"{layer}.{nrm}.bias"] = torch.zeros(128)
    # NOTE: embedding_convPxP comes from the rename of embedding_conv above?
    # No — conv3x3 is the rename target of embedding_conv; the patch embed
    # uses the embedding_encoder legacy name:
    del sd["adaptive_bins_layer.embedding_conv.weight"]
    del sd["adaptive_bins_layer.embedding_conv.bias"]
    _conv_keys(sd, "adaptive_bins_layer.embedding_conv", 128, 128, 3, bias=True)  # -> conv3x3
    _conv_keys(sd, pt[:-1] + ".embedding_encoder", 128, 128, 16, bias=True)       # -> embedding_convPxP
    for i, (cin, cout) in enumerate(((128, 256), (256, 256), (256, n_bins))):
        _dense_keys(sd, f"adaptive_bins_layer.regressor.{2 * i}", cin, cout)
    _conv_keys(sd, "conv_out.0", 128, n_bins, 1, bias=True)

    if ddp_prefix:
        sd = {"module." + k: v for k, v in sd.items()}
    return sd


def test_convert_reference_checkpoint_matches_flax_tree():
    sd = build_reference_statedict(n_bins=80)
    ckpt = {"model": sd, "optimizer": {}, "epoch": 7}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ref.pt")
        torch.save(ckpt, path)
        params, stats = convert_reference_checkpoint(path, "efficientnet-b1")

    # init resolution must give >= 129 mViT tokens so the query slice (and
    # hence conv_out's input width) matches real checkpoints: 320x416 ->
    # decoder 160x208 -> 10x13 = 130 tokens
    model = UnetAdaptiveBins(n_bins=80, encoder_name="efficientnet-b1")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 320, 416, 3)))

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: tuple(np.asarray(a).shape), t)

    assert shapes(params) == shapes(variables["params"])
    assert shapes(stats) == shapes(variables["batch_stats"])


def test_converted_params_run_forward():
    sd = build_reference_statedict(n_bins=16, ddp_prefix=False)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ref.pt")
        torch.save({"model": sd, "epoch": 0}, path)
        params, stats = convert_reference_checkpoint(path, "efficientnet-b1")

    model = UnetAdaptiveBins(n_bins=16, encoder_name="efficientnet-b1")
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)
    x = jnp.asarray(np.random.default_rng(0).random((1, 320, 416, 3), np.float32))
    edges, pred = model.apply({"params": params, "batch_stats": stats}, x)
    assert pred.shape == (1, 160, 208, 1)
    assert np.all(np.isfinite(np.asarray(pred)))
