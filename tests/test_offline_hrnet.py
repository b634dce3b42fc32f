"""HRNetV2-W48+C1 offline pipeline tests: output contract, scale plan,
and converter <-> flax param-tree structural agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mde_tpu.offline.hrnet import (HRNetV2C1, _scale_plan, round2nearest_multiple,
                                   hrnet_multiscale_inference)


@pytest.fixture(scope="module")
def model_and_vars():
    model = HRNetV2C1(num_classes=150)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    return model, variables


def test_output_softmax_at_segsize(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), np.float32))
    out = model.apply(variables, x, seg_size=(50, 60))
    assert out.shape == (1, 50, 60, 150)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-4)


def test_trunk_concat_width(model_and_vars):
    model, variables = model_and_vars
    # 720 = 48+96+192+384 concat at 1/4 resolution feeds the C1 head
    cbr = variables["params"]["cbr_conv"]["kernel"]
    assert cbr.shape == (3, 3, 720, 180)


def test_scale_plan_matches_reference_protocol():
    plan = _scale_plan(480, 640)
    assert len(plan) == 5
    # short side 300 on a 480x640 frame: scale 300/480 -> 300 x 400, padded /32
    (th, tw), (ph, pw) = plan[0]
    assert (th, tw) == (300, 400)
    assert ph % 32 == 0 and pw % 32 == 0 and ph >= th and pw >= tw
    # max-size rule: short 600 would make long side 800 <= 1000, so kept
    (th5, tw5), _ = plan[-1]
    assert (th5, tw5) == (600, 800)
    assert round2nearest_multiple(300, 32) == 320


def test_multiscale_inference_runs(model_and_vars):
    model, variables = model_and_vars
    img = np.random.default_rng(1).random((48, 64, 3)).astype(np.float32)

    calls = []

    def apply_fn(v, x, hw):
        calls.append(x.shape)
        return model.apply(v, x, seg_size=tuple(hw))

    seg = hrnet_multiscale_inference(apply_fn, variables, img)
    assert seg.shape == (48, 64)
    assert seg.dtype == np.int32
    assert seg.min() >= 0 and seg.max() < 150
    assert len(calls) == 5  # one per scale


def test_converter_structure_matches_flax_tree(model_and_vars):
    """Build a torch HRNet state dict procedurally (zeros) with the reference
    key layout and check the converter emits exactly the flax init tree."""
    torch = pytest.importorskip("torch")
    from mde_tpu.offline.hrnet_convert import convert_hrnet_c1

    model, variables = model_and_vars

    def conv_keys(prefix, cin, cout, k, bias=False):
        d = {f"{prefix}.weight": torch.zeros(cout, cin, k, k)}
        if bias:
            d[f"{prefix}.bias"] = torch.zeros(cout)
        return d

    def bn_keys(prefix, c):
        return {f"{prefix}.weight": torch.zeros(c), f"{prefix}.bias": torch.zeros(c),
                f"{prefix}.running_mean": torch.zeros(c),
                f"{prefix}.running_var": torch.ones(c)}

    enc = {}
    enc.update(conv_keys("conv1", 3, 64, 3)); enc.update(bn_keys("bn1", 64))
    enc.update(conv_keys("conv2", 64, 64, 3)); enc.update(bn_keys("bn2", 64))
    cin = 64
    for b in range(4):
        enc.update(conv_keys(f"layer1.{b}.conv1", cin if b == 0 else 256, 64, 1))
        enc.update(bn_keys(f"layer1.{b}.bn1", 64))
        enc.update(conv_keys(f"layer1.{b}.conv2", 64, 64, 3))
        enc.update(bn_keys(f"layer1.{b}.bn2", 64))
        enc.update(conv_keys(f"layer1.{b}.conv3", 64, 256, 1))
        enc.update(bn_keys(f"layer1.{b}.bn3", 256))
        if b == 0:
            enc.update(conv_keys("layer1.0.downsample.0", 64, 256, 1))
            enc.update(bn_keys("layer1.0.downsample.1", 256))
    enc.update(conv_keys("transition1.0.0", 256, 48, 3)); enc.update(bn_keys("transition1.0.1", 48))
    # new-branch transitions are a nested Sequential in the vendored hrnet
    # (hrnet.py:304-316): transition1.1 = Sequential(Sequential(conv, bn, relu))
    enc.update(conv_keys("transition1.1.0.0", 256, 96, 3)); enc.update(bn_keys("transition1.1.0.1", 96))
    enc.update(conv_keys("transition2.2.0.0", 96, 192, 3)); enc.update(bn_keys("transition2.2.0.1", 192))
    enc.update(conv_keys("transition3.3.0.0", 192, 384, 3)); enc.update(bn_keys("transition3.3.0.1", 384))

    stages = {2: (1, (48, 96)), 3: (4, (48, 96, 192)), 4: (3, (48, 96, 192, 384))}
    for st, (mods, chs) in stages.items():
        for m in range(mods):
            pre = f"stage{st}.{m}"
            for br, c in enumerate(chs):
                for blk in range(4):
                    enc.update(conv_keys(f"{pre}.branches.{br}.{blk}.conv1", c, c, 3))
                    enc.update(bn_keys(f"{pre}.branches.{br}.{blk}.bn1", c))
                    enc.update(conv_keys(f"{pre}.branches.{br}.{blk}.conv2", c, c, 3))
                    enc.update(bn_keys(f"{pre}.branches.{br}.{blk}.bn2", c))
            for i in range(len(chs)):
                for j in range(len(chs)):
                    if j == i:
                        continue
                    if j > i:
                        enc.update(conv_keys(f"{pre}.fuse_layers.{i}.{j}.0", chs[j], chs[i], 1))
                        enc.update(bn_keys(f"{pre}.fuse_layers.{i}.{j}.1", chs[i]))
                    else:
                        for k in range(i - j):
                            out_c = chs[i] if k == i - j - 1 else chs[j]
                            enc.update(conv_keys(f"{pre}.fuse_layers.{i}.{j}.{k}.0", chs[j], out_c, 3))
                            enc.update(bn_keys(f"{pre}.fuse_layers.{i}.{j}.{k}.1", out_c))

    dec = {}
    dec.update(conv_keys("cbr.0", 720, 180, 3)); dec.update(bn_keys("cbr.1", 180))
    dec.update(conv_keys("conv_last", 180, 150, 1, bias=True))

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        ep, dp = os.path.join(td, "enc.pth"), os.path.join(td, "dec.pth")
        torch.save(enc, ep)
        torch.save(dec, dp)
        params, stats = convert_hrnet_c1(ep, dp)

    def tree_shapes(t):
        return jax.tree_util.tree_map(lambda a: tuple(np.asarray(a).shape), t)

    expected_p = tree_shapes(variables["params"])
    got_p = tree_shapes(params)
    assert got_p == expected_p, "converted param tree structure mismatch"
    expected_s = tree_shapes(variables["batch_stats"])
    got_s = tree_shapes(stats)
    assert got_s == expected_s, "converted batch_stats tree structure mismatch"
