"""Value-level parity vs torch: identical weights through both stacks must
produce identical activations. This is what guarantees converted reference
checkpoints behave identically (structure tests alone can't catch padding/
eps/wiring drift).

Oracles are torch built-ins (nn.TransformerEncoderLayer, BatchNorm2d,
functional convs with TF-SAME padding computed per the public formula) —
composed here in the test, not copied from the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")  # skip cleanly where torch is absent
import torch.nn.functional as F  # noqa: E402

from mde_tpu.models.mvit import TransformerEncoderLayer
from mde_tpu.models.efficientnet import DepthwiseSeparableBlock, InvertedResidualBlock


def _tf_same_conv_torch(x, w, stride, groups=1):
    """TF-'SAME' conv in torch: pad = max((ceil(i/s)-1)*s + k - i, 0), split
    left/right with the extra on the right (the public TF rule)."""
    ih, iw = x.shape[-2:]
    kh, kw = w.shape[-2:]
    pad_h = max(-(ih // -stride[0]) * stride[0] - stride[0] + kh - ih, 0)
    pad_w = max(-(iw // -stride[1]) * stride[1] - stride[1] + kw - iw, 0)
    x = F.pad(x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2])
    return F.conv2d(x, w, None, stride, 0, 1, groups)


def test_lax_same_padding_matches_tf_rule():
    rng = np.random.default_rng(0)
    for hw, k, s in [((15, 17), 3, 2), ((16, 16), 3, 2), ((15, 17), 5, 2),
                     ((9, 9), 3, 1)]:
        x = rng.standard_normal((1, *hw, 4), dtype=np.float32)
        w = rng.standard_normal((k, k, 4, 8), dtype=np.float32) * 0.1
        ours = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (s, s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = _tf_same_conv_torch(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                  torch.from_numpy(w.transpose(3, 2, 0, 1)),
                                  (s, s)).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_transformer_layer_matches_torch():
    """flax TransformerEncoderLayer with weights copied from
    torch.nn.TransformerEncoderLayer must reproduce it exactly (eval mode)."""
    torch.manual_seed(0)
    d, heads, ff = 128, 4, 1024
    ref = torch.nn.TransformerEncoderLayer(d, heads, dim_feedforward=ff,
                                           dropout=0.1)
    ref.eval()

    params = {
        "self_attn": {
            "in_proj": {"kernel": ref.self_attn.in_proj_weight.detach().numpy().T,
                        "bias": ref.self_attn.in_proj_bias.detach().numpy()},
            "out_proj": {"kernel": ref.self_attn.out_proj.weight.detach().numpy().T,
                         "bias": ref.self_attn.out_proj.bias.detach().numpy()},
        },
        "linear1": {"kernel": ref.linear1.weight.detach().numpy().T,
                    "bias": ref.linear1.bias.detach().numpy()},
        "linear2": {"kernel": ref.linear2.weight.detach().numpy().T,
                    "bias": ref.linear2.bias.detach().numpy()},
        "norm1": {"scale": ref.norm1.weight.detach().numpy(),
                  "bias": ref.norm1.bias.detach().numpy()},
        "norm2": {"scale": ref.norm2.weight.detach().numpy(),
                  "bias": ref.norm2.bias.detach().numpy()},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 13, d), dtype=np.float32)

    ours_mod = TransformerEncoderLayer(d, heads, ff)
    ours = ours_mod.apply({"params": params}, jnp.asarray(x), deterministic=True)

    with torch.no_grad():
        # torch layer is seq-first: (S, N, E)
        want = ref(torch.from_numpy(x.transpose(1, 0, 2))).numpy().transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-4, atol=2e-5)


def _torch_se(x, w_r, b_r, w_e, b_e):
    g = x.mean(dim=(2, 3), keepdim=True)
    g = F.silu(F.conv2d(g, w_r, b_r))
    g = torch.sigmoid(F.conv2d(g, w_e, b_e))
    return x * g


def test_mbconv_block_matches_torch_composition():
    """InvertedResidualBlock vs the equivalent torch op chain with shared
    weights: pw-conv BN silu -> dw SAME BN silu -> SE -> pwl BN + skip."""
    rng = np.random.default_rng(2)
    cin, cmid, cout, k, s = 16, 96, 16, 5, 1
    x = rng.standard_normal((2, 14, 18, cin), dtype=np.float32)

    blk = InvertedResidualBlock(out_chs=cout, kernel=k, stride=s,
                                expand_ratio=6, se_reduced_chs=4)
    variables = blk.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    # randomize params + stats so the comparison is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape, dtype=np.float32) * 0.1),
        variables)
    # variances must be positive
    bs = variables["batch_stats"]
    bs = jax.tree_util.tree_map(lambda a: jnp.abs(a) + 0.5, bs)
    variables = {"params": variables["params"], "batch_stats": bs}

    ours = blk.apply(variables, jnp.asarray(x), train=False)

    p = variables["params"]
    st = variables["batch_stats"]

    def np_(a):
        return torch.from_numpy(np.asarray(a))

    def bn(x, pp, ss):
        return F.batch_norm(x, np_(ss["mean"]), np_(ss["var"]),
                            np_(pp["scale"]), np_(pp["bias"]), False, 0.0, 1e-3)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    y = F.conv2d(xt, np_(p["conv_pw"]["kernel"]).permute(3, 2, 0, 1))
    y = F.silu(bn(y, p["bn1"], st["bn1"]))
    wd = np_(p["conv_dw"]["kernel"]).permute(3, 2, 0, 1)   # (C,1,k,k)
    y = _tf_same_conv_torch(y, wd, (s, s), groups=cmid)
    y = F.silu(bn(y, p["bn2"], st["bn2"]))
    y = _torch_se(y,
                  np_(p["se"]["conv_reduce"]["kernel"]).permute(3, 2, 0, 1),
                  np_(p["se"]["conv_reduce"]["bias"]),
                  np_(p["se"]["conv_expand"]["kernel"]).permute(3, 2, 0, 1),
                  np_(p["se"]["conv_expand"]["bias"]))
    y = F.conv2d(y, np_(p["conv_pwl"]["kernel"]).permute(3, 2, 0, 1))
    y = bn(y, p["bn3"], st["bn3"])
    want = (y + xt).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-4, atol=2e-5)


def test_ds_block_matches_torch_composition():
    rng = np.random.default_rng(3)
    cin, cout = 32, 16
    x = rng.standard_normal((1, 12, 12, cin), dtype=np.float32)
    blk = DepthwiseSeparableBlock(out_chs=cout, kernel=3, stride=1,
                                  se_reduced_chs=8)
    variables = blk.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape, dtype=np.float32) * 0.1),
        variables)
    bs = jax.tree_util.tree_map(lambda a: jnp.abs(a) + 0.5, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    ours = blk.apply(variables, jnp.asarray(x), train=False)

    p, st = variables["params"], variables["batch_stats"]

    def np_(a):
        return torch.from_numpy(np.asarray(a))

    def bn(x, pp, ss):
        return F.batch_norm(x, np_(ss["mean"]), np_(ss["var"]),
                            np_(pp["scale"]), np_(pp["bias"]), False, 0.0, 1e-3)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    y = _tf_same_conv_torch(xt, np_(p["conv_dw"]["kernel"]).permute(3, 2, 0, 1),
                            (1, 1), groups=cin)
    y = F.silu(bn(y, p["bn1"], st["bn1"]))
    y = _torch_se(y,
                  np_(p["se"]["conv_reduce"]["kernel"]).permute(3, 2, 0, 1),
                  np_(p["se"]["conv_reduce"]["bias"]),
                  np_(p["se"]["conv_expand"]["kernel"]).permute(3, 2, 0, 1),
                  np_(p["se"]["conv_expand"]["bias"]))
    y = F.conv2d(y, np_(p["conv_pw"]["kernel"]).permute(3, 2, 0, 1))
    y = bn(y, p["bn2"], st["bn2"])
    want = y.numpy().transpose(0, 2, 3, 1)  # cin != cout -> no skip
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-4, atol=2e-5)
