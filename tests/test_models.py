"""Model structure/shape tests + channel-contract checks vs the reference spec."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mde_tpu.models import (EfficientNetEncoder, UnetAdaptiveBins,
                            get_num_channels_to_add, build_model)
from mde_tpu.models.efficientnet import round_channels, round_repeats


def _args(**kw):
    base = dict(n_bins=80, min_depth=1e-3, max_depth=10.0, norm="linear",
                encoder_name="efficientnet-b1", use_semantics=None,
                use_instance_segmentation=None, insertion_point="before-attn",
                image="rgb")
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_channel_rounding_matches_reference_tables():
    # B5 skip channels must match DecoderBN's hardcoded sums
    # (reference unet_adaptive_bins.py:63-71): stage outputs 24,40,64,176 and
    # head 2048; B1: 16,24,40,112 and head 1280.
    assert [round_channels(c, 1.0) for c in (16, 24, 40, 112, 1280)] == [16, 24, 40, 112, 1280]
    assert [round_channels(c, 1.6) for c in (16, 24, 40, 112, 1280)] == [24, 40, 64, 176, 2048]
    assert round_channels(32, 1.0) == 32 and round_channels(32, 1.6) == 48
    assert [round_repeats(r, 1.1) for r in (1, 2, 2, 3, 3, 4, 1)] == [2, 3, 3, 4, 4, 5, 2]
    assert [round_repeats(r, 2.2) for r in (1, 2, 2, 3, 3, 4, 1)] == [3, 5, 5, 7, 7, 9, 3]


def test_encoder_feature_contract_b1():
    enc = EfficientNetEncoder("efficientnet-b1")
    x = jnp.zeros((1, 64, 96, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)
    feats = enc.apply(variables, x)
    # features[4,5,6,8,11] are the decoder taps (reference unet_adaptive_bins.py:84-85)
    assert feats[4].shape[-1] == 16   # stage0
    assert feats[5].shape[-1] == 24   # stage1
    assert feats[6].shape[-1] == 40   # stage2
    assert feats[8].shape[-1] == 112  # stage4
    assert feats[11].shape[-1] == 1280  # conv_head
    # spatial strides: stem /2, stages /4 /8 /16 /16 /32
    assert feats[4].shape[1:3] == (32, 48)
    assert feats[5].shape[1:3] == (16, 24)
    assert feats[6].shape[1:3] == (8, 12)
    assert feats[8].shape[1:3] == (4, 6)
    assert feats[11].shape[1:3] == (2, 3)


def test_num_channels_to_add_contract():
    # mirrors reference unet_adaptive_bins.py:363-395
    f = get_num_channels_to_add
    assert f("efficientnet-b1", None, None, "rgb") == 0
    assert f("efficientnet-b1", "glove", None, "rgb") == 300
    assert f("efficientnet-b1", "glove-25d", None, "rgb") == 25
    assert f("efficientnet-b1", "glove-25d-inst-areas", None, "rgb") == 35
    assert f("efficientnet-b1", "glove-25d-ade20k-places-human-sizes", None, "rgb") == 35
    assert f("efficientnet-b1", None, "coco", "rgb") == 35
    assert f("efficientnet-b1", None, "ade20k_swin", "rgb") == 35
    assert f("efficientnet-b1", None, "ade20k_swin_human_sizes", "rgb") == 45
    assert f("efficientnet-b1", "glove-25d", "ade20k_swin_human_sizes", "rgb") == 70


@pytest.fixture(scope="module")
def small_rgb():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((2, 64, 96, 3), dtype=np.float32))


def _init_and_apply(model, *inputs, **kw):
    variables = model.init({"params": jax.random.PRNGKey(0)}, *inputs, **kw)
    return model.apply(variables, *inputs, **kw)


def test_plain_adabins_forward(small_rgb):
    model = UnetAdaptiveBins(n_bins=80, min_val=1e-3, max_val=10,
                             encoder_name="efficientnet-b1")
    edges, pred = _init_and_apply(model, small_rgb)
    assert edges.shape == (2, 81)
    assert pred.shape == (2, 32, 48, 1)
    e = np.asarray(edges)
    assert np.all(np.diff(e, axis=1) >= 0), "bin edges must be monotone"
    p = np.asarray(pred)
    assert np.all(p >= 1e-3 - 1e-6) and np.all(p <= 10 + 1e-5)


def test_noadabins_forward(small_rgb):
    model = UnetAdaptiveBins(n_bins=80, encoder_name="efficientnet-b1-noAdaBins")
    edges, pred = _init_and_apply(model, small_rgb)
    assert edges is None
    assert pred.shape == (2, 32, 48, 1)
    assert np.all(np.asarray(pred) >= 1e-4 - 1e-9)


def test_b5_forward(small_rgb):
    model = UnetAdaptiveBins(n_bins=100, encoder_name="efficientnet-b5")
    edges, pred = _init_and_apply(model, small_rgb)
    assert edges.shape == (2, 101)
    assert pred.shape == (2, 32, 48, 1)


@pytest.mark.parametrize("insertion", ["before-attn", "input"])
def test_semantics_glove25d(small_rgb, insertion):
    model = UnetAdaptiveBins(n_bins=40, encoder_name="efficientnet-b1",
                             semantics_mode="glove-25d", insertion_point=insertion)
    sem = jnp.asarray(np.random.default_rng(1).random((2, 64, 96, 25), dtype=np.float32))
    edges, pred = _init_and_apply(model, small_rgb, sem)
    assert edges.shape == (2, 41) and pred.shape == (2, 32, 48, 1)


@pytest.mark.parametrize("insertion", ["before-attn", "input"])
def test_instance_with_human_sizes(small_rgb, insertion):
    model = UnetAdaptiveBins(n_bins=40, encoder_name="efficientnet-b1",
                             instance_segmentation_mode="ade20k_swin_human_sizes",
                             insertion_point=insertion)
    rng = np.random.default_rng(2)
    labels = jnp.asarray(rng.random((2, 64, 96, 25), dtype=np.float32))
    areas = jnp.asarray(rng.random((2, 64, 96, 4), dtype=np.float32))
    edges, pred = _init_and_apply(model, small_rgb, None, labels, areas)
    assert edges.shape == (2, 41) and pred.shape == (2, 32, 48, 1)


def test_image_none_drops_rgb(small_rgb):
    model = UnetAdaptiveBins(n_bins=40, encoder_name="efficientnet-b1",
                             semantics_mode="glove-25d", insertion_point="input",
                             image="none")
    sem = jnp.asarray(np.random.default_rng(3).random((2, 64, 96, 25), dtype=np.float32))
    edges, pred = _init_and_apply(model, small_rgb, sem)
    assert pred.shape == (2, 32, 48, 1)


def test_before_attn_human_sizes_semantics_raises(small_rgb):
    model = UnetAdaptiveBins(n_bins=40, encoder_name="efficientnet-b1",
                             semantics_mode="glove-25d-ade20k-places-human-sizes",
                             insertion_point="before-attn")
    sem = jnp.zeros((2, 64, 96, 28))
    with pytest.raises(ValueError, match="not a .*working configuration|working configuration"):
        model.init({"params": jax.random.PRNGKey(0)}, small_rgb, sem)


def test_build_model_from_args(small_rgb):
    model = build_model(_args(use_semantics="glove-25d-inst-areas",
                              insertion_point="input"), n_bins=16)
    sem = jnp.asarray(np.random.default_rng(4).random((2, 64, 96, 26), dtype=np.float32))
    edges, pred = _init_and_apply(model, small_rgb, sem)
    assert edges.shape == (2, 17)


def test_train_mode_with_dropout_and_bn(small_rgb):
    model = UnetAdaptiveBins(n_bins=16, encoder_name="efficientnet-b1")
    variables = model.init({"params": jax.random.PRNGKey(0)}, small_rgb)
    (edges, pred), mutated = model.apply(
        variables, small_rgb, train=True,
        rngs={"dropout": jax.random.PRNGKey(1), "drop_path": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert np.all(np.isfinite(np.asarray(pred)))


def test_patch_embed_matches_strided_conv():
    """PatchEmbed (extract-patches + matmul, the stride-P-conv-backward fix)
    must equal nn.Conv(E, (P,P), strides=P, padding='VALID') with the same
    conv-layout params — including VALID truncation of non-multiple H/W."""
    import flax.linen as nn
    from mde_tpu.models.mvit import PatchEmbed

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 35, 50, 7), dtype=np.float32))
    pe = PatchEmbed(11, 16, jnp.float32)
    variables = pe.init(jax.random.PRNGKey(0), x)
    y = pe.apply(variables, x)

    conv = nn.Conv(11, (16, 16), strides=16, padding="VALID")
    yc = conv.apply({"params": dict(variables["params"])}, x)
    yc = yc.reshape(yc.shape[0], -1, yc.shape[-1])
    assert y.shape == yc.shape == (2, 6, 11)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yc), atol=2e-5)
