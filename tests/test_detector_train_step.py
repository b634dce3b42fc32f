"""End-to-end detector training smoke: one multi-stage loss + gradient step
on a toy scene reduces the total loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mde_tpu.offline.cascade_rcnn import CascadeMaskRCNN


@pytest.fixture(scope="module")
def setup():
    model = CascadeMaskRCNN(num_classes=10)
    h, w = 64, 96
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, h, w, 3), dtype=np.float32))
    gt_boxes = jnp.asarray([[8.0, 8, 40, 40], [50.0, 20, 90, 60],
                            [0.0, 0, 0, 0]])
    gt_labels = jnp.asarray([2, 5, 0])
    gt_valid = jnp.asarray([True, True, False])
    masks = np.zeros((3, h, w), np.float32)
    masks[0, 8:40, 8:40] = 1
    masks[1, 20:60, 50:90] = 1
    variables = model.init({"params": jax.random.PRNGKey(0)}, img)
    return model, variables, img, gt_boxes, gt_labels, gt_valid, jnp.asarray(masks)


def test_losses_finite_and_structured(setup):
    model, variables, img, gt_boxes, gt_labels, gt_valid, masks = setup
    losses, _ = model.apply(
        variables, img, gt_boxes, gt_labels, gt_valid, masks,
        jax.random.PRNGKey(1), (64, 96), 64,
        method=CascadeMaskRCNN.compute_losses, mutable=["batch_stats"])
    expected = {"rpn_cls", "rpn_reg", "total"} | {
        f"s{i}_{k}" for i in range(3) for k in ("cls", "reg", "mask")}
    assert expected == set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["total"]) > 0


def test_one_step_reduces_loss(setup):
    model, variables, img, gt_boxes, gt_labels, gt_valid, masks = setup
    params = variables["params"]
    stats = variables["batch_stats"]
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    def loss_fn(p, s):
        losses, mut = model.apply(
            {"params": p, "batch_stats": s}, img, gt_boxes, gt_labels,
            gt_valid, masks, jax.random.PRNGKey(2), (64, 96), 64,
            method=CascadeMaskRCNN.compute_losses, mutable=["batch_stats"])
        return losses["total"], mut["batch_stats"]

    @jax.jit
    def step(p, s, o):
        (loss, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, s)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), new_s, o, loss

    losses = []
    for _ in range(3):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
