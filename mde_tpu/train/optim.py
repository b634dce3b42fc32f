"""Optimizer: AdamW with two LR groups + OneCycle schedule (optax).

Reproduces the reference's training recipe *as it actually runs*:
  * AdamW, weight decay on everything. The reference builds an encoder lr/10
    param group unless --same_lr (train.py:345-354), BUT torch OneCycleLR
    with a scalar max_lr overwrites every param group's lr on each step, so
    at runtime the lr/10 group has no effect — all groups train at the
    scheduled lr. We default to that uniform behavior; --encoder_lr_factor
    restores the (upstream-inoperative) group split as a static update-scale
    mask on `encoder/*` params — identical arithmetic to torch's per-group lr
    because AdamW's decoupled decay is multiplied by the group lr in both
    frameworks.
  * torch OneCycleLR with cycle_momentum: cos-annealed lr from max_lr/div up
    to max_lr at 30% of steps, down to max_lr/(div*final_div); beta1 cycled
    0.95 -> 0.85 -> 0.95 in opposite phase (reference train.py:364-368).
  * global-norm gradient clip 0.1 before the update (reference train.py:427).
"""

import math
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def onecycle_lr_schedule(max_lr: float, total_steps: int, pct_start: float = 0.3,
                         div_factor: float = 25.0, final_div_factor: float = 1e4) -> Callable:
    """torch.optim.lr_scheduler.OneCycleLR (anneal_strategy='cos')."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    step_up = float(pct_start * total_steps) - 1.0
    step_down = float(total_steps - 1) - step_up

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)

        def up(s):
            pct = jnp.clip(s / jnp.maximum(step_up, 1.0), 0.0, 1.0)
            return min_lr_cos(initial_lr, max_lr, pct)

        def down(s):
            pct = jnp.clip((s - step_up) / jnp.maximum(step_down, 1.0), 0.0, 1.0)
            return min_lr_cos(max_lr, min_lr, pct)

        return jnp.where(step <= step_up, up(step), down(step))

    def min_lr_cos(start, end, pct):
        return end + (start - end) / 2.0 * (jnp.cos(math.pi * pct) + 1.0)

    return schedule


def onecycle_momentum_schedule(total_steps: int, base_momentum: float = 0.85,
                               max_momentum: float = 0.95, pct_start: float = 0.3) -> Callable:
    """Momentum (beta1) cycling opposite to lr: max -> base -> max."""
    step_up = float(pct_start * total_steps) - 1.0
    step_down = float(total_steps - 1) - step_up

    def cos_anneal(start, end, pct):
        return end + (start - end) / 2.0 * (jnp.cos(math.pi * pct) + 1.0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / jnp.maximum(step_up, 1.0), 0.0, 1.0)
        pct_dn = jnp.clip((step - step_up) / jnp.maximum(step_down, 1.0), 0.0, 1.0)
        return jnp.where(step <= step_up,
                         cos_anneal(max_momentum, base_momentum, pct_up),
                         cos_anneal(base_momentum, max_momentum, pct_dn))

    return schedule


def _encoder_scale_mask(params, factor: float) -> dict:
    """Pytree of update scales: `factor` for encoder params, 1.0 elsewhere
    (the lr/10 encoder group, reference train.py:351-352)."""

    def scale_for(path):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return factor if any(k == "encoder" for k in keys) else 1.0

    return jax.tree_util.tree_map_with_path(lambda p, _: scale_for(p), params)


def scale_by_pytree(scales):
    """optax transform multiplying updates by a static per-param scale tree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(lambda u, s: u * s, updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(params, args, steps_per_epoch: int):
    """Full optax chain for the reference recipe. Returns (tx, lr_schedule)."""
    total_steps = args.epochs * steps_per_epoch
    lr_sched = onecycle_lr_schedule(args.lr, total_steps,
                                    div_factor=args.div_factor,
                                    final_div_factor=args.final_div_factor)
    mom_sched = onecycle_momentum_schedule(total_steps)

    adamw = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr_sched, b1=mom_sched, b2=0.999, eps=1e-8,
        weight_decay=args.wd)

    chain = [optax.clip_by_global_norm(0.1), adamw]
    # The reference's encoder lr/10 group is overwritten by OneCycleLR at
    # runtime (see module docstring), so uniform lr is the parity default;
    # --encoder_lr_factor < 1 opts back into the group split.
    factor = float(getattr(args, "encoder_lr_factor", 1.0) or 1.0)
    if not getattr(args, "same_lr", False) and factor != 1.0:
        chain.append(scale_by_pytree(_encoder_scale_mask(params, factor)))
    tx = optax.chain(*chain)
    return tx, lr_sched
