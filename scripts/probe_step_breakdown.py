#!/usr/bin/env python
"""Where do the milliseconds of the flagship train step go?

Times isolated segments of the bs16 416x544 B1-AdaBins train step on the real
TPU, all in one process, each segment as ITERS iterations inside ONE lax.scan
dispatch closed by a scalar fetch (per CLAUDE.md: per-step RTT excluded,
async-lying block_until_ready excluded). Every scan body takes the carry as a
1e-30-scale input perturbation so XLA cannot hoist the loop-invariant
computation (the LICM trap documented in CLAUDE.md).

Segments:
  step       full train step (fwd + losses + bwd + clip + AdamW), real state
  grads      value_and_grad(loss_fn) with all grads consumed (no optimizer)
  loss_fwd   loss_fn value only (fwd + SILog + chamfer)
  fwd        model.apply train=True (no losses)
  fwd_g      model fwd + bwd, no losses (isolates model bwd from loss bwd)
  opt        clip + AdamW + schedule on fixed grads (the optimizer residual)
  encoder    EfficientNetEncoder alone
  encoder_g  encoder fwd + bwd (localizes depthwise-conv backward cost)
  silog      silog_loss on a fixed model-shaped pred
  chamfer    bins_chamfer_loss (jnp scan) on fixed edges
  chamfer_g  chamfer + its gradient w.r.t. edges

Derivable: bwd = grads - loss_fwd, optimizer = step - grads,
losses = loss_fwd - fwd, decoder+mViT+head = fwd - encoder.

Env knobs: SEGMENTS=a,b,c to select; PALLAS=1 flips use_pallas_chamfer +
use_fused_head on (the shipped default config); PROBE_ITERS; SKIP_STEP.

Also prints XLA cost_analysis FLOPs for step/fwd/encoder → achieved TFLOP/s
per segment, next to a chained-matmul tunnel-health stamp.
"""

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
BS = 16
ITERS = int(os.environ.get("PROBE_ITERS", "10"))


def make_args(**over):
    base = dict(
        n_bins=N_BINS, min_depth=1e-3, max_depth=10.0, norm="linear",
        encoder_name="efficientnet-b1", use_semantics=None,
        use_instance_segmentation=None, insertion_point="before-attn",
        image="rgb", w_chamfer=0.1, chamfer=True, epochs=25, lr=0.000357,
        wd=0.1, div_factor=25.0, final_div_factor=100.0, same_lr=False,
        seed=0, remat="none", use_fused_head=False, use_pallas_chamfer=False,
        # production default (parser + bench.py) since 39c243c; HIRES=native
        # to measure the unpacked layout
        hires_impl=os.environ.get("HIRES", "packed"))
    if os.environ.get("PALLAS"):
        base.update(use_fused_head=True, use_pallas_chamfer=True)
    base.update(over)
    return types.SimpleNamespace(**base)


def tunnel_health():
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(c, _):
            return (c @ x) * 0 + x + 1e-30 * c, ()
        return jax.lax.scan(body, a, None, length=50)[0]

    _ = np.asarray(chain(x)[0, 0])
    t0 = time.perf_counter()
    _ = np.asarray(chain(x)[0, 0])
    dt = time.perf_counter() - t0
    return round(50 * 2 * 4096**3 / dt / 1e12, 1)


# Roofline reference points (v5e-1), overridable for other chips: bf16 MXU
# peak and HBM bandwidth. bound_ms = max(flops/PEAK, bytes/BW) per segment;
# pct_of_bound = bound/achieved (100% = at the roofline).
PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))
HBM_GBPS = float(os.environ.get("HBM_GBPS", "819"))


def cost_of(fn, *args):
    """XLA cost-analysis (flops, bytes accessed) of one call (separate
    compile, no donation). bytes accessed is XLA's post-fusion estimate of
    HBM traffic — the roofline denominator."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        cost = cost or {}
        return (float(cost.get("flops", float("nan"))),
                float(cost.get("bytes accessed", float("nan"))))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"flops_error": f"{type(e).__name__}: {str(e)[:200]}"}),
              flush=True)
        return float("nan"), float("nan")


def flops_of(fn, *args):
    return cost_of(fn, *args)[0]


_SEGMENTS = [s for s in os.environ.get("SEGMENTS", "").split(",") if s]


def timed_scan(name, fn, *arrays, flops=float("nan"), bytes_=float("nan")):
    """fn(carry_scalar, *arrays) -> scalar; ITERS chained calls per dispatch.
    The carry must feed fn's *inputs* so the body can't be hoisted."""
    if _SEGMENTS and name not in _SEGMENTS:
        return None

    @jax.jit
    def run(c0, *a):
        def body(c, _):
            return fn(c, *a), ()
        return jax.lax.scan(body, c0, None, length=ITERS)[0]

    try:
        return _run_timed(name, run, arrays, flops, bytes_)
    except Exception as e:  # noqa: BLE001 — keep later segments alive
        print(json.dumps({"segment": name,
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}),
              flush=True)
        return None


def _run_timed(name, run, arrays, flops, bytes_=float("nan")):
    t0 = time.perf_counter()
    v = float(run(jnp.float32(0.0), *arrays))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = float(run(jnp.float32(0.0), *arrays))
    dt = time.perf_counter() - t0
    ms = 1e3 * dt / ITERS
    out = {"segment": name, "ms": round(ms, 2), "value": v,
           "compile_s": round(compile_s, 1)}
    if flops == flops:
        out["gflops"] = round(flops / 1e9, 1)
        out["achieved_tflops"] = round(flops / (dt / ITERS) / 1e12, 2)
    if bytes_ == bytes_:
        out["gbytes"] = round(bytes_ / 1e9, 2)
        # roofline: the segment can't run faster than its FLOPs on the MXU
        # or its HBM traffic on the memory bus, whichever binds
        bound_ms = max(flops / (PEAK_TFLOPS * 1e9),
                       bytes_ / (HBM_GBPS * 1e6)) if flops == flops \
            else bytes_ / (HBM_GBPS * 1e6)
        out["bound_ms"] = round(bound_ms, 2)
        out["pct_of_bound"] = round(100 * bound_ms / ms, 1)
    print(json.dumps(out), flush=True)
    return ms


def main():
    from mde_tpu.models import build_model
    from mde_tpu.models.efficientnet import EfficientNetEncoder
    from mde_tpu.ops.losses import bins_chamfer_loss, silog_loss
    from mde_tpu.parallel import make_mesh, batch_sharding, replicated_sharding
    from mde_tpu.train.loop import make_train_step
    from mde_tpu.train.state import create_train_state

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health(), "bs": BS,
                      "iters": ITERS}), flush=True)

    args = make_args()
    mesh = make_mesh()
    model = build_model(args, dtype=jnp.bfloat16, mesh=mesh)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((BS, H, W, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((BS, H, W, 1), dtype=np.float32) * 9.9 + 0.05)
    batch = {"image": jax.device_put(img, batch_sharding(mesh)),
             "depth": jax.device_put(depth, batch_sharding(mesh))}
    state = create_train_state(model, args, jax.random.PRNGKey(0), (img,),
                               steps_per_epoch=2693)
    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_train_step(model, args, None, None, mesh)

    # --- full step (real state flow, the probe_step_perf methodology) ------
    import functools

    # no donation: the later segments reuse state.params/batch_stats, which
    # donation would invalidate (HBM fits the extra state copy at bs16)
    @jax.jit
    def run_steps(st, b, key):
        def body(s, i):
            s2, m = train_step.fn(s, b, jax.random.fold_in(key, i))
            return s2, m["loss"]
        return jax.lax.scan(body, st, jnp.arange(ITERS))

    def step_once(st, b, key):
        s2, m = train_step.fn(st, b, key)
        return s2, m

    if not os.environ.get("SKIP_STEP"):
        step_flops, step_bytes = cost_of(step_once, state, batch,
                                         jax.random.PRNGKey(1))
        t0 = time.perf_counter()
        state2, losses = run_steps(state, batch, jax.random.PRNGKey(1))
        _ = float(losses[-1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state2, losses = run_steps(state2, batch, jax.random.PRNGKey(2))
        _ = float(losses[-1])
        dt = time.perf_counter() - t0
        out = {"segment": "step", "ms": round(1e3 * dt / ITERS, 2),
               "compile_s": round(compile_s, 1)}
        if step_flops == step_flops:
            out["gflops"] = round(step_flops / 1e9, 1)
            out["achieved_tflops"] = round(step_flops / (dt / ITERS) / 1e12, 2)
        if step_bytes == step_bytes:
            out["gbytes"] = round(step_bytes / 1e9, 2)
            bound_ms = max(step_flops / (PEAK_TFLOPS * 1e9),
                           step_bytes / (HBM_GBPS * 1e6))
            out["bound_ms"] = round(bound_ms, 2)
            out["pct_of_bound"] = round(100 * bound_ms / (1e3 * dt / ITERS), 1)
        print(json.dumps(out), flush=True)
        del state2

    params, stats = state.params, state.batch_stats

    # loss_fn exactly as the train step builds it
    min_depth = float(args.min_depth)
    w_chamfer = float(args.w_chamfer)

    def loss_fn(params, stats, image, depth, key):
        rngs = {"dropout": jax.random.fold_in(key, 0),
                "drop_path": jax.random.fold_in(key, 1)}
        (bin_edges, pred), mutated = model.apply(
            {"params": params, "batch_stats": stats},
            image, None, None, None, train=True, rngs=rngs,
            mutable=["batch_stats"])
        mask = depth > min_depth
        l_dense = silog_loss(pred, depth, mask, interpolate=True)
        l_chamfer = bins_chamfer_loss(bin_edges, depth)
        return l_dense + w_chamfer * l_chamfer

    key = jax.random.PRNGKey(3)

    # --- grads: all grads consumed, no optimizer --------------------------
    def seg_grads(c, image, depth):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, stats, image + c * 1e-30, depth, key)
        gsum = sum(jnp.sum(jnp.asarray(g, jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + 1e-30 * gsum

    grads_cost = cost_of(lambda im, d: seg_grads(jnp.float32(0.0), im, d),
                         batch["image"], batch["depth"])
    timed_scan("grads", seg_grads, batch["image"], batch["depth"],
               flops=grads_cost[0], bytes_=grads_cost[1])

    # --- loss_fwd ---------------------------------------------------------
    def seg_loss_fwd(c, image, depth):
        return loss_fn(params, stats, image + c * 1e-30, depth, key)

    timed_scan("loss_fwd", seg_loss_fwd, batch["image"], batch["depth"])

    # --- fwd only ---------------------------------------------------------
    def fwd(params, stats, image, key):
        rngs = {"dropout": jax.random.fold_in(key, 0),
                "drop_path": jax.random.fold_in(key, 1)}
        (bin_edges, pred), _ = model.apply(
            {"params": params, "batch_stats": stats},
            image, None, None, None, train=True, rngs=rngs,
            mutable=["batch_stats"])
        return jnp.sum(pred.astype(jnp.float32)) + jnp.sum(bin_edges)

    fwd_flops, fwd_bytes = cost_of(fwd, params, stats, batch["image"], key)

    def seg_fwd(c, image):
        return fwd(params, stats, image + c * 1e-30, key)

    timed_scan("fwd", seg_fwd, batch["image"], flops=fwd_flops,
               bytes_=fwd_bytes)

    # --- model fwd+bwd WITHOUT losses: isolates the model backward from the
    # chamfer/silog backward (grads - fwd_g = loss fwd+bwd share)
    def seg_fwd_g(c, image):
        loss, grads = jax.value_and_grad(fwd)(
            params, stats, image + c * 1e-30, key)
        gsum = sum(jnp.sum(jnp.asarray(g, jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss * 1e-30 + 1e-30 * gsum

    fwdg_cost = cost_of(lambda image: seg_fwd_g(jnp.float32(0.0), image),
                        batch["image"])
    timed_scan("fwd_g", seg_fwd_g, batch["image"], flops=fwdg_cost[0],
               bytes_=fwdg_cost[1])

    # --- optimizer alone: clip + inject_hyperparams(AdamW) on fixed grads.
    # Perturb grads by the carry so the update can't be hoisted; consume the
    # new params as a scalar.
    grads_fix = jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, 1e-4, p.dtype), params)

    def seg_opt(c, image):
        g = jax.tree_util.tree_map(lambda x: x + c * 1e-30, grads_fix)
        updates, _ = state.tx.update(g, state.opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return sum(jnp.sum(jnp.asarray(x, jnp.float32)) * 1e-30
                   for x in jax.tree_util.tree_leaves(new_params))

    timed_scan("opt", seg_opt, batch["image"])

    # --- encoder alone ----------------------------------------------------
    enc = EfficientNetEncoder("efficientnet-b1", dtype=jnp.bfloat16,
                              name="encoder")
    enc_vars = {"params": params["encoder"],
                "batch_stats": stats["encoder"]}

    def enc_fwd(v, image):
        feats, _ = enc.apply(v, image.astype(jnp.bfloat16), train=True,
                             mutable=["batch_stats"],
                             rngs={"drop_path": jax.random.PRNGKey(7)})
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    enc_flops, enc_bytes = cost_of(enc_fwd, enc_vars, batch["image"])

    def seg_enc(c, image):
        return enc_fwd(enc_vars, image + c * 1e-30)

    timed_scan("encoder", seg_enc, batch["image"], flops=enc_flops,
               bytes_=enc_bytes)

    def seg_enc_g(c, image):
        loss, grads = jax.value_and_grad(enc_fwd)(enc_vars, image + c * 1e-30)
        gsum = sum(jnp.sum(jnp.asarray(g, jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss * 1e-30 + 1e-30 * gsum

    encg_cost = cost_of(lambda image: seg_enc_g(jnp.float32(0.0), image),
                        batch["image"])
    timed_scan("encoder_g", seg_enc_g, batch["image"], flops=encg_cost[0],
               bytes_=encg_cost[1])

    # --- losses on fixed tensors ------------------------------------------
    pred_shape = (BS, H // 2, W // 2, 1)
    pred_fix = jnp.asarray(
        rng.random(pred_shape, dtype=np.float32) * 9.9 + 0.05)
    edges = jnp.sort(jnp.asarray(
        rng.random((BS, N_BINS + 1), dtype=np.float32) * 9.9 + 0.05), axis=1)

    def seg_silog(c, pred, depth):
        mask = depth > min_depth
        return silog_loss(pred + c * 1e-30, depth, mask, interpolate=True)

    timed_scan("silog", seg_silog, pred_fix, batch["depth"])

    def seg_chamfer(c, edges, depth):
        return bins_chamfer_loss(edges + c * 1e-30, depth)

    timed_scan("chamfer", seg_chamfer, edges, batch["depth"])

    def seg_chamfer_g(c, edges, depth):
        l, g = jax.value_and_grad(bins_chamfer_loss)(edges + c * 1e-30, depth)
        return l + 1e-30 * jnp.sum(g)

    timed_scan("chamfer_g", seg_chamfer_g, edges, batch["depth"])

    print(json.dumps({"tunnel_tflops_post": tunnel_health()}), flush=True)


if __name__ == "__main__":
    main()
