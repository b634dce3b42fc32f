"""HRNet semseg trainer tests: poly lr, masked NLL, a step reduces the loss,
mIoU accumulators."""

import jax
import jax.numpy as jnp
import numpy as np

from mde_tpu.offline.hrnet import HRNetV2C1
from mde_tpu.offline.hrnet_train import (build_semseg_optimizer,
                                         make_semseg_train_step,
                                         poly_lr_schedule, segmentation_loss)
from mde_tpu.ops.metrics import intersection_and_union


def test_poly_lr():
    sched = poly_lr_schedule(0.02, 100, power=0.9)
    assert abs(float(sched(jnp.asarray(0))) - 0.02) < 1e-8
    assert float(sched(jnp.asarray(50))) < 0.02
    assert float(sched(jnp.asarray(100))) == 0.0


def test_segmentation_loss_ignores_invalid():
    logp = jnp.log(jnp.full((1, 2, 2, 3), 1 / 3.0))
    labels = jnp.asarray([[[0, -1], [-1, -1]]])
    loss = float(segmentation_loss(logp, labels))
    np.testing.assert_allclose(loss, -np.log(1 / 3.0), rtol=1e-6)


def test_train_step_reduces_loss():
    model = HRNetV2C1(num_classes=8)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 8, (2, 16, 16)).astype(np.int32))

    variables = model.init({"params": jax.random.PRNGKey(0)}, images)
    tx = build_semseg_optimizer(base_lr=0.05, max_iters=100)
    params = variables["params"]
    opt_state = tx.init(params)
    batch_stats = variables["batch_stats"]
    step = make_semseg_train_step(model, tx)

    losses = []
    for _ in range(4):
        params, opt_state, batch_stats, metrics = step(
            params, opt_state, batch_stats, images, labels)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_intersection_and_union():
    pred = np.asarray([0, 1, 1, 2])
    label = np.asarray([0, 1, 2, -1])
    inter, union = intersection_and_union(pred, label, 3)
    np.testing.assert_array_equal(inter, [1, 1, 0])
    # class0: 1+1-1=1; class1: pred 2 + label 1 - inter 1 = 2;
    # class2: pred 0 (the -1 pixel is ignored) + label 1 - 0 = 1
    np.testing.assert_array_equal(union, [1, 2, 1])
