"""Semantic-segmentation training for HRNetV2+C1 — the capability of the
reference's semantic-segmentation-pytorch/train.py:93-140 (per-pixel NLL with
ignore label, SGD with poly learning-rate decay), TPU-first: one jitted
data-sharded train step, BN moments over the global batch.

The cue pipeline only needs inference (the published checkpoint converts via
offline/hrnet_convert.py); this trainer exists so the framework can also
retrain / fine-tune the semantics model end-to-end.
"""

import functools

import jax
import jax.numpy as jnp
import optax

from .hrnet import HRNetV2C1


def poly_lr_schedule(base_lr: float, max_iters: int, power: float = 0.9):
    """lr = base * (1 - iter/max_iters)^power (reference semseg
    train.py:126-131)."""

    def schedule(step):
        frac = 1.0 - jnp.minimum(step.astype(jnp.float32), max_iters) / max_iters
        return base_lr * frac ** power

    return schedule


def segmentation_loss(log_probs_nhwc, labels_nhw, ignore_index: int = -1):
    """Per-pixel NLL with ignore label; labels are class ids, -1 = ignore."""
    valid = labels_nhw != ignore_index
    safe = jnp.where(valid, labels_nhw, 0)
    ll = jnp.take_along_axis(log_probs_nhwc, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, ll, 0.0)) / n


def pixel_accuracy(log_probs_nhwc, labels_nhw, ignore_index: int = -1):
    valid = labels_nhw != ignore_index
    pred = jnp.argmax(log_probs_nhwc, axis=-1)
    correct = jnp.sum((pred == labels_nhw) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)


def build_semseg_optimizer(base_lr: float = 0.02, max_iters: int = 150000,
                           momentum: float = 0.9, weight_decay: float = 1e-4):
    """SGD + poly decay + L2 (reference semseg cfg TRAIN: lr 0.02, pow 0.9,
    beta1 0.9, wd 1e-4)."""
    sched = poly_lr_schedule(base_lr, max_iters)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=sched, momentum=momentum),
    )


def make_semseg_train_step(model: HRNetV2C1, tx):
    """Jitted train step over (image NHWC f32, labels NHW int32, -1 ignore).
    Returns step(params, opt_state, batch_stats, images, labels) ->
    (params, opt_state, batch_stats, metrics)."""

    def loss_fn(params, batch_stats, images, labels):
        log_probs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"])
        loss = segmentation_loss(log_probs, labels)
        acc = pixel_accuracy(log_probs, labels)
        return loss, (mutated.get("batch_stats", batch_stats), acc)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, batch_stats, images, labels):
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, images, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, {"loss": loss, "acc": acc}

    return step
