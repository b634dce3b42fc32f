"""Train state: params + batch stats + optimizer state + step counter.

A flax TrainState extended with batch_stats (the BN running averages the
reference carries inside its torch modules) so the whole training state is
one pytree for jit donation, orbax checkpointing, and mesh sharding.
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, args, rng, sample_batch, steps_per_epoch: int,
                       tx=None):
    """Initialize model variables and wrap them with the reference optimizer
    recipe (mde_tpu/train/optim.py)."""
    from .optim import build_optimizer

    init_rngs = {"params": rng}
    variables = model.init(init_rngs, *sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if tx is None:
        tx, _ = build_optimizer(params, args, steps_per_epoch)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                             batch_stats=batch_stats)
