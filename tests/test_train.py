"""Train-loop integration tests: optimizer schedule parity vs torch OneCycleLR,
sharded-step execution on the 8-device virtual mesh, and 1-vs-N device loss
parity (SURVEY.md §4's multi-chip-without-a-cluster pattern)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")  # skip cleanly where torch is absent

from mde_tpu.parallel import make_mesh, batch_sharding, replicated_sharding
from mde_tpu.train.loop import make_train_step
from mde_tpu.train.optim import (onecycle_lr_schedule, onecycle_momentum_schedule,
                                 build_optimizer)
from mde_tpu.train.state import create_train_state
from mde_tpu.models import build_model


def _args(**kw):
    base = dict(n_bins=8, min_depth=1e-3, max_depth=10.0, norm="linear",
                encoder_name="efficientnet-b1", use_semantics=None,
                use_instance_segmentation=None, insertion_point="before-attn",
                image="rgb", w_chamfer=0.1, chamfer=True, epochs=2, lr=0.000357,
                wd=0.1, div_factor=25.0, final_div_factor=100.0, same_lr=False,
                seed=0)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_onecycle_matches_torch():
    total_steps = 200
    max_lr = 0.000357
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr, total_steps=total_steps, cycle_momentum=True,
        base_momentum=0.85, max_momentum=0.95, div_factor=25, final_div_factor=100)
    ours_lr = onecycle_lr_schedule(max_lr, total_steps, div_factor=25,
                                   final_div_factor=100)
    ours_mom = onecycle_momentum_schedule(total_steps)

    for step in range(total_steps):
        torch_lr = opt.param_groups[0]["lr"]
        torch_b1 = opt.param_groups[0]["betas"][0]
        np.testing.assert_allclose(float(ours_lr(step)), torch_lr, rtol=5e-5,
                                   err_msg=f"lr mismatch at step {step}")
        np.testing.assert_allclose(float(ours_mom(step)), torch_b1, rtol=5e-5,
                                   err_msg=f"beta1 mismatch at step {step}")
        opt.step()
        sched.step()


def _encoder_update_ratio(args):
    params = {"encoder": {"w": jnp.ones((4,))}, "decoder": {"w": jnp.ones((4,))}}
    tx, _ = build_optimizer(params, args, steps_per_epoch=10)
    state = tx.init(params)
    grads = {"encoder": {"w": jnp.ones((4,))}, "decoder": {"w": jnp.ones((4,))}}
    updates, _ = tx.update(grads, state, params)
    return float(updates["encoder"]["w"][0] / updates["decoder"]["w"][0])


def test_encoder_lr_uniform_by_default():
    # torch OneCycleLR with a scalar max_lr overwrites the reference's encoder
    # lr/10 group each step, so uniform lr is the runtime-parity default
    np.testing.assert_allclose(_encoder_update_ratio(_args()), 1.0, rtol=1e-5)


def test_encoder_lr_factor_opt_in():
    ratio = _encoder_update_ratio(_args(encoder_lr_factor=0.1))
    np.testing.assert_allclose(ratio, 0.1, rtol=1e-5)
    # --same_lr wins over the factor, as in the reference argument surface
    np.testing.assert_allclose(
        _encoder_update_ratio(_args(encoder_lr_factor=0.1, same_lr=True)), 1.0,
        rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_setup():
    args = _args()
    model = build_model(args, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    bs = 8
    img = jnp.asarray(rng.standard_normal((bs, 64, 96, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((bs, 64, 96, 1), dtype=np.float32) * 9.9 + 0.05)
    state = create_train_state(model, args, jax.random.PRNGKey(0), (img,),
                               steps_per_epoch=10)
    return args, model, state, img, depth


def _run_steps(args, model, state, img, depth, mesh, n_steps=2):
    # deep-copy: the jitted step donates its input state, and device_put of an
    # already-resident array can alias the fixture's buffers
    state = jax.tree_util.tree_map(jnp.array, state)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = {"image": jax.device_put(img, batch_sharding(mesh)),
             "depth": jax.device_put(depth, batch_sharding(mesh))}
    step = make_train_step(model, args, None, None, mesh)
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))  # same rng both runs
        losses.append(float(metrics["loss"]))
    return losses


def test_one_vs_eight_device_parity(tiny_setup):
    args, model, state, img, depth = tiny_setup
    mesh1 = make_mesh("1", devices=jax.devices()[:1])
    mesh8 = make_mesh("8", devices=jax.devices()[:8])
    l1 = _run_steps(args, model, state, img, depth, mesh1)
    l8 = _run_steps(args, model, state, img, depth, mesh8)
    # identical batch, identical rng: 8-way sharded step must match 1-chip step
    np.testing.assert_allclose(l1, l8, rtol=2e-4,
                               err_msg="sharded step diverged from single-chip step")
    assert all(np.isfinite(l1))


def test_remat_encoder_matches_no_remat(tiny_setup):
    """--remat encoder recomputes activations in the backward; losses and
    updates must be identical to the non-remat step."""
    args, model, state, img, depth = tiny_setup
    mesh = make_mesh("1", devices=jax.devices()[:1])
    base = _run_steps(args, model, state, img, depth, mesh)

    args_r = _args(remat="encoder")
    model_r = build_model(args_r, dtype=jnp.float32)
    remat = _run_steps(args_r, model_r, state, img, depth, mesh)
    # step 1 is bit-identical; step 2 inherits ~1e-5 rel f32 reduction-order
    # noise from the recomputed backward — anything structural would be O(1)
    np.testing.assert_allclose(base, remat, rtol=2e-4,
                               err_msg="remat changed the training math")


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_forward():
    import __graft_entry__
    fn, example_args = __graft_entry__.entry()
    edges, pred = jax.jit(fn)(*example_args)
    assert pred.shape[0] == example_args[0].shape[0]
    assert np.all(np.isfinite(np.asarray(pred, dtype=np.float32)))


def test_train_step_fn_scan_matches_sequential(tiny_setup):
    """make_train_step exposes the unjitted body as .fn; scanning it N steps
    in one dispatch (bench.py's timing mode) must match N sequential jitted
    calls."""
    args, model, state, img, depth = tiny_setup
    mesh = make_mesh("1", devices=jax.devices()[:1])
    seq = _run_steps(args, model, state, img, depth, mesh, n_steps=3)

    state2 = jax.tree_util.tree_map(jnp.array, state)
    state2 = jax.device_put(state2, replicated_sharding(mesh))
    batch = {"image": jax.device_put(img, batch_sharding(mesh)),
             "depth": jax.device_put(depth, batch_sharding(mesh))}
    step = make_train_step(model, args, None, None, mesh)

    @jax.jit
    def run3(st):
        def body(s, _):
            s2, m = step.fn(s, batch, jax.random.PRNGKey(100))
            return s2, m["loss"]
        return jax.lax.scan(body, st, None, length=3)

    _, losses = run3(state2)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(seq), rtol=2e-4)


def test_tensor_parallel_matches_dp(tiny_setup):
    """('data','model') mesh with output-channel-sharded weights
    (parallel/mesh.py::train_state_sharding) must train identically to the
    single-device step — GSPMD inserts the TP collectives, the math is the
    same up to reduction order."""
    from mde_tpu.parallel import train_state_sharding

    args, model, state, img, depth = tiny_setup
    mesh1 = make_mesh("1", devices=jax.devices()[:1])
    base = _run_steps(args, model, state, img, depth, mesh1)

    mesh42 = make_mesh("4,2", devices=jax.devices()[:8])
    state2 = jax.tree_util.tree_map(jnp.array, state)
    sh = train_state_sharding(state2, mesh42)
    # the rule must actually shard something on the model axis
    specs = [s.spec for s in jax.tree_util.tree_leaves(sh)]
    assert any(spec and spec[-1] == "model" for spec in specs)
    state2 = jax.device_put(state2, sh)
    batch = {"image": jax.device_put(img, batch_sharding(mesh42)),
             "depth": jax.device_put(depth, batch_sharding(mesh42))}
    step = make_train_step(model, args, None, None, mesh42)
    losses = []
    for _ in range(2):
        state2, metrics = step(state2, batch, jax.random.PRNGKey(100))
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses, base, rtol=2e-4,
                               err_msg="tensor-parallel step diverged from DP")


def test_multi_step_dispatch_matches_single(tiny_setup):
    """--steps_per_dispatch scans N steps in one dispatch with the same
    fold_in(rng, global_step) stream as the per-step driver path — final
    losses and params must match the single-step sequence exactly."""
    from mde_tpu.train.loop import make_multi_step

    args, model, state, img, depth = tiny_setup
    mesh = make_mesh("1", devices=jax.devices()[:1])
    batch = {"image": jax.device_put(img, batch_sharding(mesh)),
             "depth": jax.device_put(depth, batch_sharding(mesh))}
    step = make_train_step(model, args, None, None, mesh)
    rng = jax.random.PRNGKey(7)

    # single-step path: fold_in(rng, step) per step, like train/driver.py
    s1 = jax.device_put(jax.tree_util.tree_map(jnp.array, state),
                        replicated_sharding(mesh))
    singles = []
    for i in range(4):
        s1, m = step(s1, batch, jax.random.fold_in(rng, i))
        singles.append(float(m["loss"]))

    # two dispatch windows of 2 steps
    s2 = jax.device_put(jax.tree_util.tree_map(jnp.array, state),
                        replicated_sharding(mesh))
    multi = make_multi_step(step, 2)
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), batch)
    s2, ms0 = multi(s2, stacked, 0, rng)
    s2, ms1 = multi(s2, stacked, 2, rng)
    windows = [float(v) for v in np.asarray(ms0["loss"])] + \
              [float(v) for v in np.asarray(ms1["loss"])]

    # step 0 runs from identical state/batch/rng — any rng-stream or wiring
    # bug would be O(1); later steps inherit f32 reduction-order noise from
    # the scanned body compiling differently than the standalone step (same
    # class as test_remat_encoder_matches_no_remat, ~2e-4 rel by step 4)
    np.testing.assert_allclose(singles[0], windows[0], rtol=1e-6)
    np.testing.assert_allclose(singles, windows, rtol=1e-3)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    # params see the same noise through AdamW's sign-sensitive updates on
    # near-zero weights — bound by a few update magnitudes (lr=3.57e-4)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_accum_steps_matches_manual_mean_gradient(tiny_setup):
    """--accum_steps 2 must equal the hand-built oracle: per-micro-batch
    grads with sequentially threaded BN stats and fold_in(rng, 4096+i)
    micro rngs, averaged, applied through the same optimizer once."""
    from mde_tpu.ops.losses import silog_loss, bins_chamfer_loss

    args, model, state, img, depth = tiny_setup
    mesh = make_mesh("1", devices=jax.devices()[:1])
    batch = {"image": jax.device_put(img, batch_sharding(mesh)),
             "depth": jax.device_put(depth, batch_sharding(mesh))}
    rng = jax.random.PRNGKey(3)

    args_a = _args(accum_steps=2)
    step_a = make_train_step(model, args_a, None, None, mesh)
    s_a = jax.device_put(jax.tree_util.tree_map(jnp.array, state),
                         replicated_sharding(mesh))
    s_a, m_a = step_a(s_a, batch, rng)

    # oracle: replicate the loop's loss for this config (no cues)
    def loss_fn(params, stats, b, r):
        rngs = {"dropout": jax.random.fold_in(r, 0),
                "drop_path": jax.random.fold_in(r, 1)}
        (edges, pred), mut = model.apply(
            {"params": params, "batch_stats": stats}, b["image"],
            None, None, None, train=True, rngs=rngs, mutable=["batch_stats"])
        mask = b["depth"] > float(args.min_depth)
        loss = silog_loss(pred, b["depth"], mask) \
            + float(args.w_chamfer) * bins_chamfer_loss(edges, b["depth"])
        return loss, mut["batch_stats"]

    s_o = jax.tree_util.tree_map(jnp.array, state)
    half = {k: v[:4] for k, v in batch.items()}, {k: v[4:] for k, v in batch.items()}
    (l0, stats1), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        s_o.params, s_o.batch_stats, half[0], jax.random.fold_in(rng, 4096))
    (l1, stats2), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        s_o.params, stats1, half[1], jax.random.fold_in(rng, 4097))
    gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g0, g1)
    s_o = s_o.apply_gradients(grads=gm).replace(batch_stats=stats2)

    np.testing.assert_allclose(float(m_a["loss"]), float((l0 + l1) / 2), rtol=1e-6)
    # scanned vs unrolled micro-passes compile with different fusion
    # choices; AdamW's m/sqrt(v) amplifies the f32 grad noise on
    # near-zero-variance weights — bound well below one update (lr=3.57e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_o.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)
