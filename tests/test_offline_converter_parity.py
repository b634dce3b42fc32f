"""Value-parity for the offline-stack weight converters vs the vendored torch
code (VERDICT r2 missing #1).

The released HRNet/Swin checkpoints aren't available in this environment, but
the torch model code they load into *is* — vendored inside the reference tree.
So: instantiate those torch models on CPU with random weights (including BN
running stats), run `convert_hrnet_encoder`/`convert_swin_backbone` on their
state_dicts, and assert the flax forwards match the torch forwards. Any
transpose, naming, ordering, eps, or resize-semantics drift in the converters
or the flax modules fails here with O(1) error.

Reference code under test:
  semantic-segmentation-pytorch/mit_semseg/models/hrnet.py:259-445 (HRNetV2),
  mit_semseg/models/models.py:363-385 (C1 decoder),
  Swin-Transformer-Object-Detection/mmdet/models/backbones/
      swin_transformer.py:449-630 (SwinTransformer backbone).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

_SEMSEG_ROOT = "/root/reference/semantic-segmentation-pytorch"
_SWIN_FILE = ("/root/reference/Swin-Transformer-Object-Detection/"
              "mmdet/models/backbones/swin_transformer.py")


def randomize_(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g, dtype=torch.float32) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g, dtype=torch.float32) + 0.5)


def _nhwc(t):
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


# ------------------------------------------------------------------ HRNet + C1

def test_hrnet_c1_converter_value_parity(tmp_path):
    if _SEMSEG_ROOT not in sys.path:
        sys.path.insert(0, _SEMSEG_ROOT)
    hrnet_mod = pytest.importorskip("mit_semseg.models.hrnet")
    from mit_semseg.models.models import C1

    import jax.numpy as jnp
    from mde_tpu.offline.hrnet import HRNetV2C1
    from mde_tpu.offline.hrnet_convert import convert_hrnet_c1

    enc = hrnet_mod.HRNetV2(n_class=1000)
    randomize_(enc, 10)
    enc.eval()
    dec = C1(num_class=150, fc_dim=720, use_softmax=True)
    randomize_(dec, 11)
    dec.eval()

    g = torch.Generator().manual_seed(12)
    x = torch.randn(1, 3, 64, 96, generator=g)
    with torch.no_grad():
        feats = enc(x, return_feature_maps=True)
        probs_t = dec(feats, segSize=(64, 96))  # (1, 150, 64, 96) softmax

    enc_path, dec_path = tmp_path / "enc.pth", tmp_path / "dec.pth"
    torch.save(enc.state_dict(), str(enc_path))
    torch.save(dec.state_dict(), str(dec_path))
    params, stats = convert_hrnet_c1(str(enc_path), str(dec_path))

    model = HRNetV2C1(dtype=jnp.float32)
    probs_f = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(_nhwc(x)), seg_size=(64, 96))

    # softmax over 150 classes of O(1) logits: wiring errors shift mass by
    # O(1e-1); f32 reduction-order noise stays ~1e-5
    np.testing.assert_allclose(np.asarray(probs_f).transpose(0, 3, 1, 2),
                               probs_t.numpy(), rtol=1e-3, atol=1e-4,
                               err_msg="HRNetV2+C1 diverged from reference torch model")


# ----------------------------------------------------------------------- Swin

def _load_reference_swin():
    """Import the mmdet fork's swin_transformer.py standalone: stub out the
    timm/mmcv/mmdet glue it imports (none of which affects the math) and give
    it a package context so `from ..builder import BACKBONES` resolves."""
    if "refpkg.backbones.swin_transformer" in sys.modules:
        return sys.modules["refpkg.backbones.swin_transformer"]

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or not self.drop_prob:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype))
            return x / keep * mask

    def to_2tuple(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    mmcv_custom = types.ModuleType("mmcv_custom")
    mmcv_custom.load_checkpoint = lambda *a, **k: None
    mmdet = types.ModuleType("mmdet")
    mmdet_utils = types.ModuleType("mmdet.utils")
    import logging
    mmdet_utils.get_root_logger = lambda *a, **k: logging.getLogger("ref_swin")

    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    refpkg = types.ModuleType("refpkg")
    refpkg.__path__ = []
    refpkg_backbones = types.ModuleType("refpkg.backbones")
    refpkg_backbones.__path__ = []
    refpkg_builder = types.ModuleType("refpkg.builder")
    refpkg_builder.BACKBONES = _Registry()

    sys.modules.update({
        "timm": timm, "timm.models": timm_models,
        "timm.models.layers": timm_layers,
        "mmcv_custom": mmcv_custom,
        "mmdet": mmdet, "mmdet.utils": mmdet_utils,
        "refpkg": refpkg, "refpkg.backbones": refpkg_backbones,
        "refpkg.builder": refpkg_builder,
    })
    spec = importlib.util.spec_from_file_location(
        "refpkg.backbones.swin_transformer", _SWIN_FILE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refpkg.backbones.swin_transformer"] = mod
    spec.loader.exec_module(mod)
    return mod


# Smaller-than-B depths/dims keep the CPU forward fast while exercising every
# conversion rule (qkv packing, rel-pos tables, patch-merge reduction, per-out
# norms) and both the even (stage0 14x21) and odd (stage2 4x6 after merging 7)
# padding regimes. Dim/head scaling in Swin is explicit config, not derived
# arithmetic, so small dims lose no converter coverage.
_DEPTHS = (2, 2, 4, 2)
_HEADS = (2, 4, 8, 16)
_EMBED = 32


def test_swin_converter_value_parity():
    ref = _load_reference_swin()

    import jax.numpy as jnp
    from mde_tpu.offline.swin import SwinTransformer
    from mde_tpu.offline.swin_convert import convert_swin_backbone

    tm = ref.SwinTransformer(embed_dim=_EMBED, depths=list(_DEPTHS),
                             num_heads=list(_HEADS), window_size=7,
                             drop_path_rate=0.0, ape=False, patch_norm=True)
    randomize_(tm, 20)
    tm.eval()

    g = torch.Generator().manual_seed(21)
    x = torch.randn(2, 3, 56, 84, generator=g)
    with torch.no_grad():
        outs_t = tm(x)  # 4 NCHW maps at strides 4/8/16/32
    assert len(outs_t) == 4

    sd = {"backbone." + k: v for k, v in tm.state_dict().items()}
    params = convert_swin_backbone(sd, depths=_DEPTHS)

    fm = SwinTransformer(embed_dim=_EMBED, depths=_DEPTHS, num_heads=_HEADS,
                         dtype=jnp.float32)
    outs_f = fm.apply({"params": params}, jnp.asarray(_nhwc(x)))

    for i, (ot, of) in enumerate(zip(outs_t, outs_f)):
        np.testing.assert_allclose(
            np.asarray(of).transpose(0, 3, 1, 2), ot.numpy(),
            rtol=2e-3, atol=2e-3,
            err_msg=f"Swin stage {i} features diverged from reference torch model")


# ------------------------------------------------------------------- ResNeXt

def test_resnext101_converter_value_parity():
    """semseg_zoo ResNetEncoder('resnext101') + convert_resnet_encoder vs the
    vendored CSAIL ResNeXt (mit_semseg/models/resnext.py:62-151): random
    weights, compare the four stage feature maps (the slice ModelBuilder's
    Resnet wrapper exposes, models.py:96-98)."""
    if _SEMSEG_ROOT not in sys.path:
        sys.path.insert(0, _SEMSEG_ROOT)
    resnext_mod = pytest.importorskip("mit_semseg.models.resnext")

    import jax.numpy as jnp
    from mde_tpu.offline.semseg_zoo import ResNetEncoder
    from mde_tpu.offline.hrnet_convert import convert_resnet_encoder

    t_model = resnext_mod.resnext101(pretrained=False)
    randomize_(t_model, 20)
    t_model.eval()

    g = torch.Generator().manual_seed(21)
    x = torch.randn(1, 3, 64, 96, generator=g)
    with torch.no_grad():
        # replicate the Resnet wrapper's conv_out collection (models.py:179-200)
        y = t_model.relu1(t_model.bn1(t_model.conv1(x)))
        y = t_model.relu2(t_model.bn2(t_model.conv2(y)))
        y = t_model.relu3(t_model.bn3(t_model.conv3(y)))
        y = t_model.maxpool(y)
        feats_t = []
        for layer in (t_model.layer1, t_model.layer2, t_model.layer3,
                      t_model.layer4):
            y = layer(y)
            feats_t.append(y)

    params, stats = convert_resnet_encoder(t_model.state_dict())
    enc = ResNetEncoder("resnext101", dilated=False, dtype=jnp.float32)
    feats_f = enc.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(_nhwc(x)))

    assert [f.shape[-1] for f in feats_f] == [256, 512, 1024, 2048]
    for ff, ft in zip(feats_f, feats_t):
        np.testing.assert_allclose(
            np.asarray(ff).transpose(0, 3, 1, 2), ft.numpy(),
            rtol=1e-3, atol=1e-3,
            err_msg="resnext101 encoder diverged from vendored torch model")


# ------------------------------------------- Swin rel-pos re-interpolation

def test_rel_pos_table_resize_matches_torch_bicubic():
    """resize_rel_pos_table vs the fork's own logic
    (mmcv_custom/checkpoint.py:336-353): permute to (1,nH,S1,S1),
    F.interpolate bicubic, permute back — exact weight-level parity."""
    import torch.nn.functional as F
    from mde_tpu.offline.swin_convert import resize_rel_pos_table

    g = torch.Generator().manual_seed(30)
    for s1, s2 in ((13, 15), (15, 13), (7, 23), (23, 7)):
        nH = 4
        table = torch.randn((2 * s1 - 1) ** 2, nH, generator=g)
        L2 = (2 * s2 - 1) ** 2
        S1, S2 = 2 * s1 - 1, 2 * s2 - 1
        ref = F.interpolate(
            table.permute(1, 0).view(1, nH, S1, S1), size=(S2, S2),
            mode="bicubic").view(nH, L2).permute(1, 0).numpy()
        ours = resize_rel_pos_table(table.numpy(), L2)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_convert_swin_backbone_resizes_mismatched_tables():
    """convert_swin_backbone(window_size=W) reshapes every block's table to
    (2W-1)^2 rows; exact-shape tables pass through bit-identically."""
    from mde_tpu.offline.swin_convert import convert_swin_backbone

    g = torch.Generator().manual_seed(31)
    depths = (1, 1)
    sd = {}
    dim = 8
    for s, depth in enumerate(depths):
        for b in range(depth):
            src = f"backbone.layers.{s}.blocks.{b}"
            for ln in (".norm1", ".norm2"):
                sd[src + ln + ".weight"] = torch.ones(dim)
                sd[src + ln + ".bias"] = torch.zeros(dim)
            sd[src + ".attn.qkv.weight"] = torch.randn(3 * dim, dim, generator=g)
            sd[src + ".attn.qkv.bias"] = torch.zeros(3 * dim)
            sd[src + ".attn.proj.weight"] = torch.randn(dim, dim, generator=g)
            sd[src + ".attn.proj.bias"] = torch.zeros(dim)
            # pretrained at window 12 -> (2*12-1)^2 = 529 rows
            sd[src + ".attn.relative_position_bias_table"] = torch.randn(
                529, 2, generator=g)
            sd[src + ".mlp.fc1.weight"] = torch.randn(dim, dim, generator=g)
            sd[src + ".mlp.fc1.bias"] = torch.zeros(dim)
            sd[src + ".mlp.fc2.weight"] = torch.randn(dim, dim, generator=g)
            sd[src + ".mlp.fc2.bias"] = torch.zeros(dim)
    sd["backbone.patch_embed.proj.weight"] = torch.randn(dim, 3, 4, 4, generator=g)
    sd["backbone.patch_embed.proj.bias"] = torch.zeros(dim)
    sd["backbone.patch_embed.norm.weight"] = torch.ones(dim)
    sd["backbone.patch_embed.norm.bias"] = torch.zeros(dim)
    sd["backbone.layers.0.downsample.norm.weight"] = torch.ones(4 * dim)
    sd["backbone.layers.0.downsample.norm.bias"] = torch.zeros(4 * dim)
    sd["backbone.layers.0.downsample.reduction.weight"] = torch.randn(
        2 * dim, 4 * dim, generator=g)
    for s in range(4):
        sd[f"backbone.norm{s}.weight"] = torch.ones(dim)
        sd[f"backbone.norm{s}.bias"] = torch.zeros(dim)

    p = convert_swin_backbone(sd, depths=depths, window_size=7)
    for s, depth in enumerate(depths):
        for b in range(depth):
            t = p[f"stage{s}_block{b}"]["attn"]["relative_position_bias_table"]
            assert t.shape == (169, 2)       # (2*7-1)^2

    # matching window size: bit-exact pass-through
    p2 = convert_swin_backbone(sd, depths=depths, window_size=12)
    t2 = p2["stage0_block0"]["attn"]["relative_position_bias_table"]
    np.testing.assert_array_equal(
        t2, sd["backbone.layers.0.blocks.0.attn.relative_position_bias_table"].numpy())
