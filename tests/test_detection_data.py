"""Detector training-pipeline tests: AutoAugment geometry invariants, GT
padding, paramwise optimizer labels."""

import jax
import numpy as np

from mde_tpu.offline.detection_data import (autoaugment_sample, pad_gt,
                                            detector_param_labels,
                                            detector_optimizer, SCALES_MAIN)


def _scene(h=240, w=320):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    boxes = np.asarray([[20, 30, 120, 150], [200, 50, 300, 200]], np.float32)
    labels = np.asarray([3, 7], np.int32)
    masks = np.zeros((2, h, w), np.uint8)
    masks[0, 30:150, 20:120] = 1
    masks[1, 50:200, 200:300] = 1
    return img, boxes, labels, masks


def test_autoaugment_output_contract():
    img, boxes, labels, masks = _scene()
    for seed in range(6):
        rng = np.random.default_rng(seed)
        pad, b, l, m, (h, w) = autoaugment_sample(rng, img, boxes, labels, masks)
        assert pad.shape[0] % 32 == 0 and pad.shape[1] % 32 == 0
        assert pad.shape[0] >= h and pad.shape[1] >= w
        assert min(h, w) <= 800 + 32 and max(h, w) <= 1333 + 32
        if len(b):
            assert b[:, 0].min() >= -1e-3 and b[:, 2].max() <= w + 1e-3
            assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
            assert len(l) == len(b)
            if m is not None and len(m):
                assert m.shape[0] == len(b)


def test_boxes_track_masks_after_aug():
    img, boxes, labels, masks = _scene()
    rng = np.random.default_rng(1)
    pad, b, l, m, (h, w) = autoaugment_sample(rng, img, boxes, labels, masks)
    # each surviving mask's bounding box ~ the transformed box
    for i in range(len(b)):
        ys, xs = np.nonzero(m[i])
        if len(ys) == 0:
            continue
        assert abs(xs.min() - b[i, 0]) < 6
        assert abs(ys.min() - b[i, 1]) < 6


def test_pad_gt_capacity():
    img, boxes, labels, masks = _scene()
    ob, ol, ov, om = pad_gt(boxes, labels, masks, (240, 320), max_gt=16)
    assert ob.shape == (16, 4) and ov.sum() == 2
    np.testing.assert_array_equal(ol[:2], labels)
    assert om.shape == (16, 240, 320)


def test_paramwise_labels_and_optimizer():
    import jax.numpy as jnp
    params = {
        "backbone": {
            "stage0_block0": {
                "norm1": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                "attn": {"qkv": {"kernel": jnp.ones((4, 12)), "bias": jnp.zeros(12)},
                         "relative_position_bias_table": jnp.zeros((169, 4))},
                "mlp_fc1": {"kernel": jnp.ones((4, 16)), "bias": jnp.zeros(16)},
            }}}
    labels = detector_param_labels(params)
    blk = labels["backbone"]["stage0_block0"]
    assert blk["norm1"]["scale"] == "no_decay"
    assert blk["attn"]["relative_position_bias_table"] == "no_decay"
    assert blk["attn"]["qkv"]["kernel"] == "decay"
    assert blk["attn"]["qkv"]["bias"] == "no_decay"
    assert blk["mlp_fc1"]["kernel"] == "decay"

    tx = detector_optimizer(params, steps_per_epoch=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(float(updates["backbone"]["stage0_block0"]["mlp_fc1"]["kernel"][0, 0]))


def test_detector_lr_warmup_schedule():
    """mmcv linear warmup semantics (schedule_1x.py:7-9): step 0 trains at
    base_lr*warmup_ratio, ramps linearly to base_lr at warmup_iters, then
    the 27/33-epoch step decay applies."""
    import jax.numpy as jnp
    from mde_tpu.offline.detection_data import detector_lr_schedule

    base = 1e-4
    sched = detector_lr_schedule(base_lr=base, steps_per_epoch=100,
                                 warmup_iters=500, warmup_ratio=1e-3)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), base * 1e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(float(sched(jnp.asarray(250))),
                               base * (1 - 0.5 * (1 - 1e-3)), rtol=1e-4)
    np.testing.assert_allclose(float(sched(jnp.asarray(500))), base, rtol=1e-4)
    np.testing.assert_allclose(float(sched(jnp.asarray(2699))), base, rtol=1e-4)
    np.testing.assert_allclose(float(sched(jnp.asarray(2700))), base * 0.1,
                               rtol=1e-4)
    np.testing.assert_allclose(float(sched(jnp.asarray(3300))), base * 0.01,
                               rtol=1e-4)
