"""Swin Cascade Mask R-CNN pipeline tests: detection primitives vs brute-force
oracles, backbone/neck shape contracts, converter structural agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mde_tpu.offline.detection_ops import (base_anchors, grid_anchors, delta2bbox,
                                           nms_fixed, batched_nms_fixed, box_iou,
                                           roi_align, map_rois_to_fpn_levels)


def test_base_anchors():
    a = base_anchors(16)  # stride 16, scale 8 -> base size 128
    assert a.shape == (3, 4)
    # ratio 1.0 anchor is square 128x128 centered at 0
    sq = a[1]
    np.testing.assert_allclose(sq, [-64, -64, 64, 64])
    # areas equal across ratios
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    np.testing.assert_allclose(areas, areas[0], rtol=1e-5)


def test_grid_anchors_layout():
    a = grid_anchors(2, 3, 4)
    assert a.shape == (2 * 3 * 3, 4)
    # anchor centers advance by stride along x within a row
    c0 = (a[0, 0] + a[0, 2]) / 2
    c1 = (a[3, 0] + a[3, 2]) / 2
    assert c1 - c0 == 4


def test_delta2bbox_identity_and_shift():
    rois = jnp.asarray([[10.0, 10.0, 50.0, 30.0]])
    zero = jnp.zeros((1, 4))
    np.testing.assert_allclose(np.asarray(delta2bbox(rois, zero)), np.asarray(rois),
                               atol=1e-5)
    # dx=0.1 moves center by 0.1*w
    shift = jnp.asarray([[0.1, 0.0, 0.0, 0.0]])
    out = np.asarray(delta2bbox(rois, shift))[0]
    np.testing.assert_allclose((out[0] + out[2]) / 2, 30 + 0.1 * 40, rtol=1e-5)


def _nms_oracle(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in order:
        if alive[i]:
            keep.append(i)
            alive[iou[i] > thr] = False
    return keep


def test_nms_matches_oracle():
    rng = np.random.default_rng(0)
    n = 60
    xy = rng.random((n, 2)) * 50
    wh = rng.random((n, 2)) * 30 + 5
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.random(n).astype(np.float32)
    keep_idx, keep_valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
    got = [int(i) for i, v in zip(np.asarray(keep_idx), np.asarray(keep_valid)) if v]
    want = _nms_oracle(boxes, scores, 0.5)[:20]
    assert got == want


def test_batched_nms_separates_ids():
    # identical overlapping boxes with different ids must both survive
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    ids = jnp.asarray([0, 1])
    _, keep_valid = batched_nms_fixed(boxes, scores, ids, 0.5, 2)
    assert np.asarray(keep_valid).sum() == 2
    _, keep_valid_same = batched_nms_fixed(boxes, scores, jnp.asarray([0, 0]), 0.5, 2)
    assert np.asarray(keep_valid_same).sum() == 1


def _roi_align_oracle(feat, roi, out, scale, s=2):
    """Naive python RoIAlign (aligned=True), s x s samples per bin."""
    h, w, c = feat.shape
    x1, y1, x2, y2 = roi * scale - 0.5
    bw = max(x2 - x1, 1e-6) / out
    bh = max(y2 - y1, 1e-6) / out
    res = np.zeros((out, out, c))
    for py in range(out):
        for px in range(out):
            acc = np.zeros(c)
            for iy in range(s):
                for ix in range(s):
                    yy = y1 + (py + (iy + 0.5) / s) * bh
                    xx = x1 + (px + (ix + 0.5) / s) * bw
                    if yy < -1 or yy > h or xx < -1 or xx > w:
                        continue
                    yy, xx = max(yy, 0.0), max(xx, 0.0)  # mmcv snap-to-edge
                    y0, x0 = int(np.floor(yy)), int(np.floor(xx))
                    fy, fx = yy - y0, xx - x0
                    def v(r, cc):
                        return feat[min(max(r, 0), h - 1), min(max(cc, 0), w - 1)]
                    acc += (v(y0, x0) * (1 - fy) * (1 - fx) + v(y0, x0 + 1) * (1 - fy) * fx
                            + v(y0 + 1, x0) * fy * (1 - fx) + v(y0 + 1, x0 + 1) * fy * fx)
            res[py, px] = acc / (s * s)
    return res


def test_roi_align_matches_oracle():
    rng = np.random.default_rng(1)
    feat = rng.random((12, 16, 3)).astype(np.float32)
    rois = np.asarray([[4.0, 4.0, 40.0, 28.0], [0.0, 0.0, 63.0, 47.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat[None]), jnp.asarray(rois), 7, 0.25))
    for i in range(2):
        want = _roi_align_oracle(feat, rois[i], 7, 0.25)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_fpn_level_mapping():
    rois = jnp.asarray([
        [0, 0, 20, 20],      # tiny -> level 0
        [0, 0, 112, 112],    # 112 = 56*2 -> level 1
        [0, 0, 224, 224],    # -> level 2
        [0, 0, 448, 448],    # -> level 3
        [0, 0, 2000, 2000],  # clamped to 3
    ], jnp.float32)
    lvls = np.asarray(map_rois_to_fpn_levels(rois))
    assert list(lvls) == [0, 1, 2, 3, 3]


@pytest.fixture(scope="module")
def tiny_detector():
    from mde_tpu.offline.cascade_rcnn import CascadeMaskRCNN
    model = CascadeMaskRCNN(num_classes=100)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    return model, variables


def test_swin_fpn_shapes(tiny_detector):
    from mde_tpu.offline.swin import SwinTransformer
    model = SwinTransformer(embed_dim=128)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    outs = model.apply(variables, x)
    assert [o.shape[-1] for o in outs] == [128, 256, 512, 1024]
    assert outs[0].shape[1:3] == (16, 24)
    assert outs[3].shape[1:3] == (2, 3)


def test_detector_infer_contract(tiny_detector):
    model, variables = tiny_detector
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 96, 3),
                                                             dtype=np.float32))
    det = model.apply(variables, x, (64, 96), method=model.infer)
    assert det["boxes"].shape == (100, 4)
    assert det["scores"].shape == (100,)
    assert det["labels"].shape == (100,)
    assert det["masks28"].shape == (100, 28, 28)
    b = np.asarray(det["boxes"])
    assert b[:, 0].min() >= 0 and b[:, 2].max() <= 96 + 1e-3
    assert b[:, 1].min() >= 0 and b[:, 3].max() <= 64 + 1e-3


def test_collapse_detections_order():
    from mde_tpu.offline.cascade_rcnn import collapse_detections
    det = {
        "labels": np.asarray([5, 2]),
        "boxes": np.asarray([[0, 0, 4, 4], [0, 0, 4, 4]], np.float32),
        "valid": np.asarray([True, True]),
    }
    masks = np.zeros((2, 6, 6), bool)
    masks[0, :4, :4] = True   # class 5 instance
    masks[1, 1:3, 1:3] = True  # class 2 instance overlapping
    labels_map, areas_map = collapse_detections(det, masks, 6, 6)
    # class order ascending: class 5 painted after class 2 -> overwrites overlap
    assert labels_map[2, 2] == 5
    assert labels_map[0, 0] == 5
    assert labels_map[5, 5] == -1
    assert areas_map[0, 0] == 16


def test_detector_converter_structure(tiny_detector):
    """Procedurally build an mmdet-layout state dict and check the converter
    reproduces the flax init tree structure."""
    torch = pytest.importorskip("torch")
    from mde_tpu.offline.swin_convert import convert_detector

    model, variables = tiny_detector

    sd = {}

    def add_conv(prefix, cin, cout, k, bias=True):
        sd[prefix + ".weight"] = torch.zeros(cout, cin, k, k)
        if bias:
            sd[prefix + ".bias"] = torch.zeros(cout)

    def add_dense(prefix, cin, cout):
        sd[prefix + ".weight"] = torch.zeros(cout, cin)
        sd[prefix + ".bias"] = torch.zeros(cout)

    def add_ln(prefix, c):
        sd[prefix + ".weight"] = torch.zeros(c)
        sd[prefix + ".bias"] = torch.zeros(c)

    def add_bn(prefix, c):
        add_ln(prefix, c)
        sd[prefix + ".running_mean"] = torch.zeros(c)
        sd[prefix + ".running_var"] = torch.ones(c)

    depths = (2, 2, 18, 2)
    dims = (128, 256, 512, 1024)
    heads = (4, 8, 16, 32)
    add_conv("backbone.patch_embed.proj", 3, 128, 4)
    add_ln("backbone.patch_embed.norm", 128)
    for s, depth in enumerate(depths):
        d = dims[s]
        for b in range(depth):
            src = f"backbone.layers.{s}.blocks.{b}"
            add_ln(src + ".norm1", d)
            add_ln(src + ".norm2", d)
            add_dense(src + ".attn.qkv", d, 3 * d)
            add_dense(src + ".attn.proj", d, d)
            sd[src + ".attn.relative_position_bias_table"] = torch.zeros(169, heads[s])
            add_dense(src + ".mlp.fc1", d, 4 * d)
            add_dense(src + ".mlp.fc2", 4 * d, d)
        if s < 3:
            add_ln(f"backbone.layers.{s}.downsample.norm", 4 * d)
            sd[f"backbone.layers.{s}.downsample.reduction.weight"] = torch.zeros(2 * d, 4 * d)
    for s, d in enumerate(dims):
        add_ln(f"backbone.norm{s}", d)
    for i, d in enumerate(dims):
        add_conv(f"neck.lateral_convs.{i}.conv", d, 256, 1)
        add_conv(f"neck.fpn_convs.{i}.conv", 256, 256, 3)
    add_conv("rpn_head.rpn_conv", 256, 256, 3)
    add_conv("rpn_head.rpn_cls", 256, 3, 1)
    add_conv("rpn_head.rpn_reg", 256, 12, 1)
    for i in range(3):
        src = f"roi_head.bbox_head.{i}"
        for j in range(4):
            add_conv(f"{src}.shared_convs.{j}.conv", 256, 256, 3, bias=False)
            add_bn(f"{src}.shared_convs.{j}.bn", 256)
        add_dense(f"{src}.shared_fcs.0", 256 * 49, 1024)
        add_dense(f"{src}.fc_cls", 1024, 101)
        add_dense(f"{src}.fc_reg", 1024, 400)
        msrc = f"roi_head.mask_head.{i}"
        for j in range(4):
            add_conv(f"{msrc}.convs.{j}.conv", 256, 256, 3)
        sd[msrc + ".upsample.weight"] = torch.zeros(256, 256, 2, 2)
        sd[msrc + ".upsample.bias"] = torch.zeros(256)
        add_conv(f"{msrc}.conv_logits", 256, 100, 1)

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "det.pth")
        torch.save({"state_dict": sd}, path)
        params, stats = convert_detector(path)

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: tuple(np.asarray(a).shape), t)

    assert shapes(params) == shapes(variables["params"])
    assert shapes(stats) == shapes(variables["batch_stats"])
