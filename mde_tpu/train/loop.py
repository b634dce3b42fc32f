"""Training driver: jitted sharded train step + periodic validation.

The reference hot loop (train.py:387-455) does per-step H2D copies, host-side
cue embedding, DDP all-reduce, clip, AdamW, OneCycle. Here one jitted
`train_step` fuses the whole thing — cue embedding, forward, SILog + chamfer,
backward, clip, AdamW with scheduled lr/beta1 — over a `data`-sharded batch;
XLA inserts the gradient psum (the DDP all-reduce) and computes BN moments
over the global batch (the SyncBN). The host only feeds pre-sharded batches
through the double-buffered prefetcher and reads back scalar metrics every
log interval, so steps never serialize on the host.
"""

import functools
import uuid
from datetime import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np

from ..cues import InstanceEmbedder, SemanticsEmbedder
from ..data import DepthDataLoader
from ..data.prefetch import DevicePrefetcher
from ..ops.losses import bins_chamfer_loss, silog_loss
from ..ops.resize import resize_bilinear_align_corners
from ..ops.metrics import compute_errors_masked, eval_mask, METRIC_NAMES
from ..parallel import make_mesh, batch_sharding, replicated_sharding, shard_batch_size
from ..utils import RunningAverage, RunningAverageDict
from .state import TrainState


def make_run_id(args) -> str:
    """Run-id naming convention (reference train.py:321-322)."""
    return (f"{dt.now().strftime('%d-%h_%H-%M')}-nodebs{args.bs}-tep{args.epochs}"
            f"-lr{args.lr}-wd{args.wd}-{uuid.uuid4()}")


def _embed_cues(batch, sem_embedder, inst_embedder):
    semantics = None
    instance_labels = None
    instance_areas = None
    if "semantics" in batch and sem_embedder is not None:
        _, semantics = sem_embedder(batch["semantics"])
    if "instance_labels" in batch and inst_embedder is not None:
        _, instance_labels, instance_areas = inst_embedder(
            batch["instance_labels"], batch["instance_areas"])
    return semantics, instance_labels, instance_areas


def make_train_step(model, args, sem_embedder, inst_embedder, mesh):
    """Build the jitted train step. State is donated; batch arrives
    data-sharded; outputs are replicated scalars."""
    w_chamfer = float(args.w_chamfer)
    use_chamfer = getattr(args, "chamfer", w_chamfer > 0) and not model.no_adabins
    min_depth = float(args.min_depth)

    # Chamfer implementation choice. The Pallas kernel (kernels/chamfer.py)
    # wins both standalone (6.9x) and in-step: the healthy-session A/B
    # (probe_step_perf.py 2026-08-17) measured 369.5 -> 253.8 ms/step at bs16
    # 416x544 just from swapping the jnp chunked scan for the kernel, so it
    # defaults on (--no-use_pallas_chamfer opts out; ignored on cpu/gpu).
    use_pallas = bool(getattr(args, "use_pallas_chamfer", False) or False)
    if use_pallas and np.asarray(mesh.devices).flat[0].platform in ("cpu", "gpu"):
        from ..kernels import chamfer as _chamfer_mod
        # Mosaic is TPU-only; CPU runs only when tests/dryruns force the
        # interpreter (kernels/chamfer.py FORCE_INTERPRET)
        use_pallas = _chamfer_mod.FORCE_INTERPRET
    if use_pallas:
        from ..kernels.sharded import chamfer_1d_pallas_sharded
        chamfer_fn = functools.partial(chamfer_1d_pallas_sharded, mesh=mesh)
    else:
        chamfer_fn = bins_chamfer_loss

    def loss_fn(params, batch_stats, batch, rng):
        semantics, instance_labels, instance_areas = _embed_cues(
            batch, sem_embedder, inst_embedder)
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "drop_path": jax.random.fold_in(rng, 1)}
        (bin_edges, pred), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], semantics, instance_labels, instance_areas,
            train=True, rngs=rngs, mutable=["batch_stats"])

        depth = batch["depth"]
        mask = depth > min_depth
        l_dense = silog_loss(pred, depth, mask, interpolate=True)
        if use_chamfer and bin_edges is not None:
            l_chamfer = chamfer_fn(bin_edges, depth)
        else:
            l_chamfer = jnp.float32(0.0)
        loss = l_dense + w_chamfer * l_chamfer
        return loss, (mutated.get("batch_stats", batch_stats), l_dense, l_chamfer)

    # --accum_steps K: split the batch into K micro-batches, run K
    # forward/backward passes sequentially and apply the MEAN gradient once.
    # This reproduces the reference's DDP objective shape (each GPU computes
    # its own SILog and DDP averages the gradients, train.py:298,426) with
    # micro-batch in place of replica, and caps activation memory at one
    # micro-batch — the lever for large effective batches on few chips.
    # BN running stats thread through the micro-passes sequentially, exactly
    # like K successive forwards on one replica.
    accum = max(1, int(getattr(args, "accum_steps", 1) or 1))

    def step_fn(state: TrainState, batch, rng):
        if accum == 1:
            (loss, (new_stats, l_dense, l_chamfer)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        else:
            bs = batch["image"].shape[0]
            assert bs % accum == 0, (
                f"batch size {bs} must divide --accum_steps {accum}")
            micros = jax.tree_util.tree_map(
                lambda v: v.reshape(accum, bs // accum, *v.shape[1:]), batch)

            def micro_body(carry, inp):
                stats, gsum, lsum = carry
                mb, i = inp
                (l, (stats, l_d, l_c)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, stats, mb,
                                           jax.random.fold_in(rng, 4096 + i))
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (stats, gsum, lsum + jnp.stack([l, l_d, l_c])), None

            gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, gsum, lsum), _ = jax.lax.scan(
                micro_body, (state.batch_stats, gzero, jnp.zeros(3)),
                (micros, jnp.arange(accum)))
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            loss, l_dense, l_chamfer = lsum[0] / accum, lsum[1] / accum, lsum[2] / accum
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = {"loss": loss, "silog": l_dense, "chamfer": l_chamfer}
        return state, metrics

    train_step = jax.jit(step_fn, donate_argnums=(0,))
    # Unjitted body, so callers can scan N steps inside one dispatch
    # (bench.py — one RPC per measurement window instead of per step).
    train_step.fn = step_fn
    return train_step


def make_multi_step(train_step, n: int):
    """Scan `n` train steps inside ONE dispatch (--steps_per_dispatch).

    The single-step driver pays one host->device dispatch round-trip per
    step; on remote/tunneled TPU attachments that RTT can rival the step
    itself. This runner consumes a pytree of `n` stacked batches and runs the
    whole window on-device, returning per-step metrics stacked on the leading
    axis. The rng stream is fold_in(rng, global_step), the same stream the
    per-step driver path uses; results match the single-step sequence to f32
    reduction-order tolerance (the scanned body compiles with different
    fusion choices than the standalone step —
    tests/test_train.py::test_multi_step_dispatch_matches_single).
    """
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, batches, start_step, rng):
        def body(s, inp):
            i, b = inp
            return train_step.fn(s, b, jax.random.fold_in(rng, i))
        return jax.lax.scan(body, state, (start_step + jnp.arange(n), batches))

    return run


def make_eval_step(model, args, sem_embedder, inst_embedder):
    """Jitted eval step: forward (no TTA, matching reference validate /
    evaluate), align-corners resize to GT, clamp+scrub, masked metrics —
    all on device (reference train.py:505-568 round-trips to numpy per image)."""
    min_d, max_d = float(args.min_depth_eval), float(args.max_depth_eval)
    min_depth = float(args.min_depth)

    @jax.jit
    def eval_step(params, batch_stats, batch, crop_mask):
        semantics, instance_labels, instance_areas = _embed_cues(
            batch, sem_embedder, inst_embedder)
        _, pred = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], semantics, instance_labels, instance_areas, train=False)
        # metric math stays f32 even when the model computes in bf16
        # (--compute_dtype bfloat16, the serving-throughput opt-in)
        pred = pred.astype(jnp.float32)
        depth = batch["depth"]

        pred = resize_bilinear_align_corners(pred, depth.shape[1:3])
        # per-image SILog (vmapped) — the reference validates at bs=1, so its
        # val silog is a per-image average; per-image values also let the host
        # drop invalid-depth samples without discarding the rest of the batch
        l_dense = jax.vmap(
            lambda p, d: silog_loss(p[None], d[None], (d > min_depth)[None],
                                    interpolate=False))(pred, depth)
        pred = jnp.clip(pred, min_d, max_d)
        pred = jnp.where(jnp.isinf(pred), max_d, pred)
        pred = jnp.where(jnp.isnan(pred), min_d, pred)

        gt = depth[..., 0]
        pr = pred[..., 0]
        valid = (gt > min_d) & (gt < max_d) & crop_mask[None, :, :]
        # per-image metrics (vmapped) so batched eval aggregates exactly like
        # the reference's per-image RunningAverage at bs=1
        metrics = jax.vmap(compute_errors_masked)(gt, pr, valid)
        return l_dense, metrics

    return eval_step


def validate(args, eval_step, state, test_loader, max_batches=None):
    """Run online validation; returns (metric dict, mean val silog)."""
    val_si = RunningAverage()
    metrics = RunningAverageDict()
    crop = jnp.asarray(eval_mask(
        (480, 640) if args.dataset == "nyu" else (352, 1216),
        dataset=args.dataset, garg_crop=args.garg_crop, eigen_crop=args.eigen_crop))
    for i, batch in enumerate(test_loader):
        if max_batches is not None and i >= max_batches:
            break
        bs = batch["depth"].shape[0]
        # per-sample skip (reference validates at bs=1 and skips invalid-GT
        # samples individually, train.py:516-518) — do not drop whole batches
        valid = np.asarray(batch["has_valid_depth"]).reshape(-1).astype(bool) \
            if "has_valid_depth" in batch else np.ones(bs, bool)
        if not valid.any():
            continue
        if batch["depth"].shape[1:3] != crop.shape:
            crop_b = jnp.asarray(eval_mask(batch["depth"].shape[1:3], args.dataset,
                                           args.garg_crop, args.eigen_crop))
        else:
            crop_b = crop
        arrays = {k: v for k, v in batch.items()
                  if k in ("image", "depth", "semantics", "instance_labels",
                           "instance_areas")}
        si, m = eval_step(state.params, state.batch_stats, arrays, crop_b)
        si = np.asarray(si)
        m = {k: np.asarray(v) for k, v in m.items()}
        for j in range(bs):
            if not valid[j]:
                continue
            val_si.append(float(si[j]))
            metrics.update({k: float(v[j]) for k, v in m.items()})
    vals = metrics.get_value() if metrics._dict else {k: float("nan") for k in METRIC_NAMES}
    return vals, val_si
