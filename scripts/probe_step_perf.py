#!/usr/bin/env python
"""A/B the flagship train step on the real TPU across head/chamfer/remat/batch
variants, all in one process (warm compile tunnel). Prints one JSON line per
variant. Used to pick bench.py's defaults (round-2 perf pass)."""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 416, 544
N_BINS = 256
WARMUP = 3
ITERS = int(os.environ.get("PROBE_ITERS", "10"))


def make_args(**over):
    base = dict(
        n_bins=N_BINS, min_depth=1e-3, max_depth=10.0, norm="linear",
        encoder_name="efficientnet-b1", use_semantics=None,
        use_instance_segmentation=None, insertion_point="before-attn",
        image="rgb", w_chamfer=0.1, chamfer=True, epochs=25, lr=0.000357,
        wd=0.1, div_factor=25.0, final_div_factor=100.0, same_lr=False,
        seed=0, remat="none", use_fused_head=False, use_pallas_chamfer=False)
    base.update(over)
    return types.SimpleNamespace(**base)


def run_variant(name, batch_size, shape=None, **over):
    from mde_tpu.models import build_model
    from mde_tpu.parallel import make_mesh, batch_sharding, replicated_sharding
    from mde_tpu.train.loop import make_train_step
    from mde_tpu.train.state import create_train_state

    from mde_tpu.cues import InstanceEmbedder, SemanticsEmbedder

    args = make_args(**over)
    mesh = make_mesh()
    model = build_model(args, dtype=jnp.bfloat16, mesh=mesh)
    rng = np.random.default_rng(0)
    h, w = shape or (H, W)
    img = jnp.asarray(rng.standard_normal((batch_size, h, w, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((batch_size, h, w, 1), dtype=np.float32) * 9.9 + 0.05)
    sem_emb = SemanticsEmbedder(args) if args.use_semantics else None
    inst_emb = InstanceEmbedder(args) if args.use_instance_segmentation else None
    state = batch = train_step = metrics = None
    try:
        batch = {"image": jax.device_put(img, batch_sharding(mesh)),
                 "depth": jax.device_put(depth, batch_sharding(mesh))}
        model_inputs = [img]
        if sem_emb is not None:
            sem_raw = jnp.asarray(rng.integers(0, 150, (batch_size, h, w, 1)),
                                  jnp.int32)
            batch["semantics"] = jax.device_put(sem_raw, batch_sharding(mesh))
            model_inputs.append(sem_emb(sem_raw)[1])
        else:
            model_inputs.append(None)
        if inst_emb is not None:
            lab_raw = jnp.asarray(rng.integers(0, 100, (batch_size, h, w, 1)),
                                  jnp.int32)
            area_raw = jnp.asarray(
                rng.random((batch_size, h, w, 1), dtype=np.float32) * 5000.0)
            batch["instance_labels"] = jax.device_put(lab_raw, batch_sharding(mesh))
            batch["instance_areas"] = jax.device_put(area_raw, batch_sharding(mesh))
            _, emb_lab, emb_areas = inst_emb(lab_raw, area_raw)
            model_inputs += [emb_lab, emb_areas]
        else:
            model_inputs += [None, None]
        state = create_train_state(model, args, jax.random.PRNGKey(0),
                                   tuple(model_inputs), steps_per_epoch=2693)
        state = jax.device_put(state, replicated_sharding(mesh))
        train_step = make_train_step(model, args, sem_emb, inst_emb, mesh)

        # All ITERS steps inside one lax.scan dispatch + scalar fetch:
        # per-step tunnel RTT excluded, async-lying block_until_ready
        # excluded (CLAUDE.md).
        import functools

        @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def run_steps(st, b, rng, n):
            def body(s, i):
                s2, m = train_step.fn(s, b, jax.random.fold_in(rng, i))
                return s2, m["loss"]
            return jax.lax.scan(body, st, jnp.arange(n))

        t0 = time.perf_counter()
        state, losses = run_steps(state, batch, jax.random.PRNGKey(1), ITERS)
        loss_val = float(losses[-1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, losses = run_steps(state, batch, jax.random.PRNGKey(2), ITERS)
        loss_val = float(losses[-1])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": name, "bs": batch_size,
            "img_per_sec": round(batch_size * ITERS / dt, 1),
            "ms_per_step": round(1e3 * dt / ITERS, 2),
            "loss": loss_val,
            "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001 — report OOM/compile failures per variant
        print(json.dumps({"variant": name, "bs": batch_size,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)
    finally:
        del state, batch, train_step
        jax.clear_caches()


def tunnel_health():
    """Chained-matmul probe: measured bf16 TFLOP/s on the attached device.
    v5e-1 peak is ~197 TFLOP/s; a healthy tunnel sustains >50, a degraded
    (per-op RTT) session reads <5. Stamped into probe output so numbers are
    interpretable on their own (VERDICT r2 weak #1)."""
    import functools
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(c, _):
            return (c @ x) * 0 + x + 1e-30 * c, ()
        return jax.lax.scan(body, a, None, length=50)[0]

    y = chain(x)
    _ = np.asarray(y[0, 0])  # warm + force real fetch
    t0 = time.perf_counter()
    y = chain(x)
    _ = np.asarray(y[0, 0])
    dt = time.perf_counter() - t0
    tflops = 50 * 2 * 4096**3 / dt / 1e12
    return round(tflops, 1)


VARIANTS = {
    "baseline": (16, {}),
    "fused_head": (16, dict(use_fused_head=True)),
    "pallas_chamfer": (16, dict(use_pallas_chamfer=True)),
    "fused_head+pallas_chamfer": (16, dict(use_fused_head=True,
                                           use_pallas_chamfer=True)),
    "fused_head_bs24": (24, dict(use_fused_head=True)),
    "fused_head+remat_bs32": (32, dict(use_fused_head=True, remat="encoder")),
    "fused_head_bs32": (32, dict(use_fused_head=True)),
    "baseline_bs24": (24, {}),
    "remat_bs32": (32, dict(remat="encoder")),
    # KITTI kb_crop operating point (352x704 crops, dataloader.py garg/kb
    # rules; full-width eval is 352x1216)
    "kitti_bs16": (16, dict(shape=(352, 704), max_depth=80.0)),
    # bs16 hit the external compile-service size limit 2026-08-18; bs8 retry
    "kitti_bs8": (8, dict(shape=(352, 704), max_depth=80.0)),
    "kitti_eval_shape": (4, dict(shape=(352, 1216), max_depth=80.0)),
    # paper's maximal cue config (params/args_train_nyu_efficientnet-b1_sem_
    # glove-25d_inst_ade20k_swin_insertion_point_input.txt): glove-25d
    # semantics + ade20k_swin instance labels/areas at the input
    "cues_bs16": (16, dict(use_semantics="glove-25d",
                           use_instance_segmentation="ade20k_swin",
                           insertion_point="input")),
    "cues_bs8": (8, dict(use_semantics="glove-25d",
                         use_instance_segmentation="ade20k_swin",
                         insertion_point="input")),
    # round-3 shipped config (both kernels) at the blocked batch sizes —
    # retried after the patch-embed fix shrank the program
    "both_bs24": (24, dict(use_fused_head=True, use_pallas_chamfer=True)),
    "both+remat_bs24": (24, dict(use_fused_head=True, use_pallas_chamfer=True,
                                 remat="encoder")),
    "both_bs32": (32, dict(use_fused_head=True, use_pallas_chamfer=True)),
    "both+remat_bs32": (32, dict(use_fused_head=True, use_pallas_chamfer=True,
                                 remat="encoder")),
    # interleave-upsample A/B (MEASURED 2026-08-18: interleave LOSES — bs16
    # 125.88 vs 156.61 ms, bs32 237.31 vs 303.36, stamps 110-112; the
    # stack+reshape relayout outweighs the saved 2-tap matmul FLOPs)
    "both_bs16": (16, dict(use_fused_head=True, use_pallas_chamfer=True)),
    # (pwm pw_impl=matmul variants measured 2026-08-18: bs16 parity
    # 126.32/127.38, bs32 loses 6% — flag retired in r5)
    # the reference's *default* encoder is efficientnet-b5
    # (CommonArgParser.py default) — the published AdaBins flagship
    "b5_bs8": (8, dict(encoder_name="efficientnet-b5", use_fused_head=True,
                       use_pallas_chamfer=True)),
    "b5_bs16": (16, dict(encoder_name="efficientnet-b5", use_fused_head=True,
                         use_pallas_chamfer=True)),
    # batch knee past bs32 (flat 121.5 -> 124.6 from bs24 -> bs32)
    "both_bs48": (48, dict(use_fused_head=True, use_pallas_chamfer=True)),
    "both+remat_bs48": (48, dict(use_fused_head=True, use_pallas_chamfer=True,
                                 remat="encoder")),
    # W-packed lane layout for encoder stage 0 (--hires_impl packed,
    # models/efficientnet.py::PackedDSBlock): full 128-lane density on the
    # C=32@208x272 blocks that the encoder bisect put ~20x off their HBM
    # bound (CLAUDE.md 2026-08-18)
    "hires_bs16": (16, dict(use_fused_head=True, use_pallas_chamfer=True,
                            hires_impl="packed")),
    "hires_bs32": (32, dict(use_fused_head=True, use_pallas_chamfer=True,
                            hires_impl="packed")),
    "b5_hires_bs8": (8, dict(encoder_name="efficientnet-b5",
                             use_fused_head=True, use_pallas_chamfer=True,
                             hires_impl="packed")),
    # (hires2 packed2 variants measured 2026-08-20: lose 7-15% in-step;
    # rszm bf16-intermediate resize: exact noise; upf fused up-block:
    # bs16 +23% loss — all three retired, see README "Measured experiments")
}


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health()}), flush=True)
    names = sys.argv[1:] or ["baseline", "fused_head", "fused_head+pallas_chamfer",
                             "fused_head_bs24", "fused_head+remat_bs32",
                             "fused_head_bs32"]
    for name in names:
        bs, over = VARIANTS[name]
        run_variant(name, bs, **over)
    print(json.dumps({"tunnel_tflops_post": tunnel_health()}), flush=True)


if __name__ == "__main__":
    main()
