"""Semseg model-zoo tests: every encoder/decoder combination the reference's
ModelBuilder supports forwards with the right output contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mde_tpu.offline.semseg_zoo import (SegmentationModel, ResNetEncoder,
                                        _adaptive_avg_pool)


def test_adaptive_avg_pool_matches_torch_semantics():
    import torch
    rng = np.random.default_rng(0)
    x = rng.random((1, 7, 9, 3)).astype(np.float32)
    for scale in (1, 2, 3, 6):
        ours = np.asarray(_adaptive_avg_pool(jnp.asarray(x), scale))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_resnet_dilated_keeps_stride8():
    enc = ResNetEncoder("resnet50", dilated=True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)
    outs = enc.apply(variables, x)
    assert len(outs) == 4
    assert outs[-1].shape == (1, 8, 8, 2048)       # stride 8 with dilation
    assert outs[0].shape == (1, 16, 16, 256)


def test_resnet18_channels():
    enc = ResNetEncoder("resnet18", dilated=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)
    outs = enc.apply(variables, x)
    assert outs[-1].shape[-1] == 512
    assert outs[-1].shape[1:3] == (2, 2)           # stride 32 undilated


@pytest.mark.parametrize("encoder,decoder", [
    ("resnet50dilated", "ppm"),
    ("resnet18dilated", "c1"),
    ("mobilenetv2dilated", "c1"),
    ("resnet50", "upernet"),
])
def test_zoo_combinations_forward(encoder, decoder):
    model = SegmentationModel(arch_encoder=encoder, arch_decoder=decoder,
                              num_classes=20)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3), np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(variables, x, seg_size=(50, 60))
    assert out.shape == (1, 50, 60, 20)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-4)
