#!/usr/bin/env python
"""Measured reference datapoint (VERDICT r1: replace the 12 img/s guess).

The reference's training hardware (2x GTX 1080) is not available, so the only
apples-to-apples measurement we can make is both stacks on THIS host's CPU:
the reference's own torch UnetAdaptiveBins (models under /root/reference,
around the gen-efficientnet-layout basemodel the parity test builds) vs our
flax model forced onto the CPU backend — same shapes, same batch, fwd+bwd+
AdamW step, SILog loss (chamfer excluded on both sides: the reference's needs
pytorch3d, unavailable here).

Prints one JSON line with both numbers; the ratio is the framework-overhead
comparison that transfers across hardware.

Usage: python scripts/measure_reference_cpu.py [--bs 2] [--iters 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, "/root/reference")

import numpy as np

H, W = 416, 544
N_BINS = 256


def measure_torch(bs: int, iters: int) -> float:
    import torch
    from models.unet_adaptive_bins import UnetAdaptiveBins as TorchUnet
    from test_reference_model_parity import make_basemodel

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchUnet(make_basemodel(), n_bins=N_BINS, min_val=1e-3,
                      max_val=10.0, norm="linear",
                      encoder_name="efficientnet-b1")
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=3.57e-4, weight_decay=0.1)
    x = torch.randn(bs, 3, H, W)
    depth = torch.rand(bs, 1, H, W) * 9.9 + 0.05

    def silog(pred, target):
        pred = torch.nn.functional.interpolate(
            pred, target.shape[-2:], mode="bilinear", align_corners=True)
        g = torch.log(pred.clamp_min(1e-6)) - torch.log(target)
        return 10.0 * torch.sqrt(g.var() + 0.15 * g.mean() ** 2)

    def step():
        opt.zero_grad()
        _, pred = model(x)
        loss = silog(torch.relu(pred) + 1e-3, depth)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.1)
        opt.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(iters):
        step()
    return bs * iters / (time.time() - t0)


def measure_jax_cpu(bs: int, iters: int) -> float:
    import types

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mde_tpu.models import build_model
    from mde_tpu.parallel import make_mesh, batch_sharding, replicated_sharding
    from mde_tpu.train.loop import make_train_step
    from mde_tpu.train.state import create_train_state

    args = types.SimpleNamespace(
        n_bins=N_BINS, min_depth=1e-3, max_depth=10.0, norm="linear",
        encoder_name="efficientnet-b1", use_semantics=None,
        use_instance_segmentation=None, insertion_point="before-attn",
        image="rgb", w_chamfer=0.0, chamfer=False, epochs=25, lr=3.57e-4,
        wd=0.1, div_factor=25.0, final_div_factor=100.0, same_lr=False, seed=0)
    mesh = make_mesh("1", devices=jax.devices("cpu")[:1])
    model = build_model(args, dtype=jnp.float32)  # torch CPU is fp32; compare like-for-like
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((bs, H, W, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((bs, H, W, 1), dtype=np.float32) * 9.9 + 0.05)
    state = create_train_state(model, args, jax.random.PRNGKey(0), (img,),
                               steps_per_epoch=2693)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = {"image": jax.device_put(img, batch_sharding(mesh)),
             "depth": jax.device_put(depth, batch_sharding(mesh))}
    step = make_train_step(model, args, None, None, mesh)
    state, m = step(state, batch, jax.random.PRNGKey(1))  # compile + warmup
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for i in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m["loss"])
    return bs * iters / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    torch_ips = measure_torch(args.bs, args.iters)
    jax_ips = measure_jax_cpu(args.bs, args.iters)
    print(json.dumps({
        "metric": "train step img/s on identical host CPU (B1 AdaBins 256 bins, "
                  "416x544, fp32, SILog)",
        "torch_reference": round(torch_ips, 3),
        "jax_mde_tpu": round(jax_ips, 3),
        "jax_over_torch": round(jax_ips / torch_ips, 2),
        "ncores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
