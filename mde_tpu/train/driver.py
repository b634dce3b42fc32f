"""End-to-end training driver (the reference's train.py:264-502 equivalents).

One process drives the whole mesh: no mp.spawn, no process groups, no DDP
wrapper — `main_train(args)` builds the mesh, shards batches over the data
axis, and runs the jitted step. Checkpoints (latest per validation, best on
abs_rel) and scalar/figure logging match the reference cadence
(train.py:432-499).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import (load_backbone_npz, save_checkpoint,
                          wait_for_checkpoints)
from ..cues import InstanceEmbedder, SemanticsEmbedder
from ..data import DepthDataLoader
from ..data.prefetch import DevicePrefetcher
from ..models import build_model
from ..parallel import (batch_sharding, make_mesh, replicated_sharding,
                        shard_batch_size, train_state_sharding)
from ..parallel.mesh import maybe_init_distributed
from ..train.loop import (make_eval_step, make_multi_step, make_train_step,
                          make_run_id, validate)
from ..train.state import create_train_state
from ..utils import setup_exp_dir
from ..utils.graphs import GraphBuilderNYUD2, visualize_semantics
from ..utils.logging import SummaryLogger


def _sample_model_inputs(args, batch, sem_embedder, inst_embedder):
    """Build the positional model inputs (image, semantics, instance_labels,
    instance_areas) for init from a host batch."""
    from ..train.loop import _embed_cues
    sem, lab, areas = _embed_cues(batch, sem_embedder, inst_embedder)
    return (jnp.asarray(batch["image"]), sem, lab, areas)


def _apply_pretrained_backbone(state, args, compute_dtype):
    path = getattr(args, "pretrained_backbone", None)
    if not path:
        return state
    params, stats = load_backbone_npz(path)
    new_params = dict(state.params)
    enc = jax.tree_util.tree_map(jnp.asarray, params)
    cur_enc = state.params["encoder"]
    # input-insertion: widen the stem kernel, pretrained RGB slice first.
    # With image='none' the stem sees only cue channels and the reference
    # re-creates conv_stem with random init (unet_adaptive_bins.py:349-354),
    # so keep the randomly initialized stem instead of grafting RGB weights.
    stem = enc["conv_stem"]["kernel"]
    cur_stem = cur_enc["conv_stem"]["kernel"]
    if stem.shape != cur_stem.shape:
        if getattr(args, "image", "rgb") == "none":
            enc["conv_stem"]["kernel"] = cur_stem
        else:
            widened = np.asarray(cur_stem).copy()
            widened[:, :, :stem.shape[2], :] = np.asarray(stem)[:, :, :widened.shape[2], :]
            enc["conv_stem"]["kernel"] = jnp.asarray(widened)
    new_params["encoder"] = enc
    new_stats = dict(state.batch_stats)
    new_stats["encoder"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return state.replace(params=jax.tree_util.tree_map(lambda x: x, new_params),
                         batch_stats=new_stats)


def main_train(args, max_steps=None, interactive=True):
    """Train per the parsed args; returns final TrainState."""
    maybe_init_distributed(args)
    mesh = make_mesh(getattr(args, "mesh_shape", None))
    run_id = _agree_run_id(args)   # FIRST collective — see docstring
    data_sh = batch_sharding(mesh)

    args.batch_size = shard_batch_size(args.bs, mesh,
                                       getattr(args, "use_new_batching", False))

    compute_dtype = jnp.bfloat16 if getattr(args, "compute_dtype", "bfloat16") == "bfloat16" \
        else jnp.float32
    # build_model gates --use_fused_head on the backend (Mosaic is TPU-only).
    model = build_model(args, dtype=compute_dtype, mesh=mesh)

    sem_embedder = SemanticsEmbedder(args) if args.use_semantics else None
    inst_embedder = InstanceEmbedder(args) if args.use_instance_segmentation else None

    train_loader = DepthDataLoader(args, "train")
    test_loader = DepthDataLoader(args, "online_eval")
    steps_per_epoch = len(train_loader)
    if steps_per_epoch == 0:
        raise ValueError("empty training split")

    rng = jax.random.PRNGKey(getattr(args, "seed", 42))
    first_batch = next(iter(train_loader))
    init_inputs = _sample_model_inputs(args, first_batch, sem_embedder, inst_embedder)
    # local_devices, NOT devices: under jax.distributed the global list's
    # first entry belongs to process 0, and pinning another rank's eager
    # init to that non-addressable device segfaults inside threefry
    # (found by the real 2-process run, scripts/run_multihost_cpu.py).
    with jax.default_device(jax.local_devices()[0]):
        state = create_train_state(model, args, rng, init_inputs, steps_per_epoch)
    state = _apply_pretrained_backbone(state, args, compute_dtype)

    # --resume: restore the full train state (params, optimizer, step) from
    # 'latest' in the exp dir or an explicit checkpoint path (the working
    # counterpart of the reference's disused --resume, TrainArgParser.py:15-16,
    # driven by scripts/keep_resuming_until_success.sh).
    start_epoch = 0
    resume = getattr(args, "resume", "")
    if resume:
        ckpt_path = _find_resume_checkpoint(resume, getattr(args, "exp_dir", None))
        if ckpt_path:
            from ..checkpoint import load_checkpoint
            state, start_epoch = load_checkpoint(ckpt_path, state)
            print(f"resumed from {ckpt_path} at epoch {start_epoch}")

    # replicate state over the mesh
    # replicated on a ('data',) mesh; tensor-parallel over 'model' when the
    # mesh has one (--mesh_shape "d,m")
    state = jax.device_put(state, train_state_sharding(state, mesh))

    train_step = make_train_step(model, args, sem_embedder, inst_embedder, mesh)
    eval_step = make_eval_step(model, args, sem_embedder, inst_embedder)

    # qualitative-figure forward: one extra inference pass per 500 steps on
    # the current train batch (the reference reuses the autograd pred; here
    # the train step is fused on-device, so a separate eval-mode forward is
    # the cheap way to get a pred back on the host)
    @jax.jit
    def qual_forward(params, batch_stats, arrays):
        from ..train.loop import _embed_cues
        sem, lab, areas = _embed_cues(arrays, sem_embedder, inst_embedder)
        _, pred = model.apply({"params": params, "batch_stats": batch_stats},
                              arrays["image"], sem, lab, areas, train=False)
        return pred

    experiment_name = args.name
    exp_dir = getattr(args, "exp_dir", None)
    if exp_dir is None:
        os.makedirs(args.root, exist_ok=True)
        exp_dir = setup_exp_dir(args.root, args.name, interactive=interactive)
        args.exp_dir = exp_dir
    # Scalars/figures are written by process 0 only (reference rank-0
    # logging, train.py:426-452); every process still participates in
    # validation collectives and orbax checkpoint barriers below.
    logger = (SummaryLogger(exp_dir) if jax.process_index() == 0
              else _NullLogger())
    graph_builder = GraphBuilderNYUD2(
        num_samples=2, semantics=args.use_semantics is not None,
        instance_labels=args.use_instance_segmentation is not None)

    best_loss = np.inf
    step = start_epoch * steps_per_epoch  # schedule state itself lives in the
    # restored optimizer count; this only keeps log/validation cadence aligned
    step_rng = jax.random.PRNGKey(getattr(args, "seed", 42) + 1)

    # --steps_per_dispatch N scans N steps inside one dispatch (one host
    # round-trip per window instead of per step) — same math, same rng
    # stream; logging/validation cadence is applied per step within the
    # window, with figures/validation evaluated on the end-of-window state.
    n_dispatch = max(1, int(getattr(args, "steps_per_dispatch", 1) or 1))
    multi_step = make_multi_step(train_step, n_dispatch) if n_dispatch > 1 else None

    def bookkeep(window_metrics, batch, epoch):
        """Per-step logging/validation/checkpoint for one dispatch window.
        Returns True when max_steps is reached (caller should stop)."""
        nonlocal step, best_loss
        for m_j in window_metrics:
            if step % 5 == 0:
                logger.add_scalar("Train/Loss", m_j["loss"], step)
                logger.add_scalar("Train/SILog", m_j["silog"], step)
                logger.add_scalar("Train/ChamferLoss", m_j["chamfer"], step)
            if step % 500 == 0:
                # qualitative grid every 500 steps (reference train.py:437-452)
                arrays = _device_batch(batch)
                pred = qual_forward(state.params, state.batch_stats, arrays)
                _log_qual_figure(logger, graph_builder, "Train/QualSamples",
                                 args, batch, pred, step)
            step += 1

            if step % args.validate_every == 0 or (max_steps and step >= max_steps):
                m, val_si = validate(args, eval_step, state, test_loader,
                                     max_batches=getattr(args, "max_val_batches", None))
                logger.add_scalar("Test/SILog", val_si.get_value(), step)
                for k, v in m.items():
                    logger.add_scalar(f"Metrics/{k}", v, step)
                # the reference's Test/QualSamples grid is also built from the
                # last *train* batch (train.py:476-490 reuses img/depth/pred
                # from the train loop, not validate()'s returns) — match that
                arrays = _device_batch(batch)
                pred = qual_forward(state.params, state.batch_stats, arrays)
                _log_qual_figure(logger, graph_builder, "Test/QualSamples",
                                 args, batch, pred, step)
                # async: the disk write overlaps the next dispatch window.
                # Under jax.distributed the async commit barrier (coordination
                # service) can interleave with the NEXT step's Gloo/ICI
                # collectives and abort the job at the first mid-training
                # save (reproduced 2026-08-21, run_multihost_cpu leg A:
                # "Shutdown::" BarrierError at step 6 right after the step-5
                # validation; single-process runs are unaffected) — so
                # multi-process runs save synchronously.
                sync_save = jax.process_count() > 1
                save_checkpoint(state, epoch, f"{experiment_name}_{run_id}_latest",
                                root=exp_dir, async_save=not sync_save)
                if m.get("abs_rel", np.inf) < best_loss:
                    save_checkpoint(state, epoch, f"{experiment_name}_{run_id}_best",
                                    root=exp_dir, async_save=not sync_save)
                    best_loss = m["abs_rel"]

            if max_steps is not None and step >= max_steps:
                return True
        return False

    for epoch in range(start_epoch, args.epochs):
        logger.add_scalar("Epoch", epoch, step)
        train_loader.set_epoch(epoch)
        # keep at least one full dispatch window in flight so grouped
        # dispatches don't stall on batch assembly
        prefetcher = DevicePrefetcher(train_loader, sharding=data_sh,
                                      depth=max(2, n_dispatch + 1))
        group = []
        for batch in prefetcher:
            if multi_step is None:
                state, metrics = train_step(state, _device_batch(batch),
                                            jax.random.fold_in(step_rng, step))
                window = [{k: float(v) for k, v in metrics.items()}]
            else:
                group.append(batch)
                if len(group) < n_dispatch:
                    continue
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                       *[_device_batch(b) for b in group])
                state, ms = multi_step(state, stacked, step, step_rng)
                ms = {k: np.asarray(v) for k, v in ms.items()}
                window = [{k: float(v[j]) for k, v in ms.items()}
                          for j in range(n_dispatch)]
                batch = group[-1]
                group = []
            if bookkeep(window, batch, epoch):
                logger.close()
                wait_for_checkpoints()
                return state
        # epoch tail shorter than the dispatch window: flush per-step
        for batch in group:
            state, metrics = train_step(state, _device_batch(batch),
                                        jax.random.fold_in(step_rng, step))
            if bookkeep([{k: float(v) for k, v in metrics.items()}], batch, epoch):
                logger.close()
                wait_for_checkpoints()
                return state
    logger.close()
    wait_for_checkpoints()
    return state


def _find_resume_checkpoint(resume: str, exp_dir):
    """Resolve --resume: an explicit path, or 'latest' -> newest *_latest
    checkpoint directory under exp_dir."""
    import glob
    if resume != "latest":
        return resume if os.path.exists(resume) else None
    if not exp_dir:
        return None
    candidates = sorted(glob.glob(os.path.join(exp_dir, "*_latest")),
                        key=os.path.getmtime)
    return candidates[-1] if candidates else None


def _agree_run_id(args) -> str:
    """All processes must agree on the run_id: orbax's async-save barrier
    names embed the checkpoint filename, and per-process timestamped ids
    deadlock the _async_write_complete barrier (found by the real 2-process
    run, scripts/run_multihost_cpu.py). Process 0 decides — the reference's
    rank-0-owns-naming semantics (train.py:383-400).

    The exchange goes through the jax.distributed key-value store (the
    coordinator's gRPC channel — what orbax's own barriers use), NOT a
    device collective: a broadcast_one_to_all would create the job's first
    Gloo/ICI collective context under per-process startup skew, and Gloo's
    context-init pairing window is a hard 30 s (measured flaky on the CPU
    backend; the KV store has no such window)."""
    run_id = make_run_id(args)
    if jax.process_count() > 1:
        from jax._src import distributed as _dist
        client = getattr(getattr(_dist, "global_state", None), "client", None)
        if client is not None:
            # scope the key by an invocation counter: key_value_set raises
            # on an existing key, so a second main_train with the same
            # --name inside one jax.distributed session (driver reuse in a
            # harness) must not collide with the first agreement. Every
            # process calls main_train the same number of times, so the
            # counters agree across ranks.
            n = _agree_run_id._calls = getattr(_agree_run_id, "_calls", 0) + 1
            key = f"mde_tpu/run_id/{args.name}/{n}"
            if jax.process_index() == 0:
                client.key_value_set(key, run_id)
            run_id = client.blocking_key_value_get(key, 300_000)
    return run_id


class _NullLogger:
    """Process>0 logger under jax.distributed: scalars/figures are rank-0's
    job (reference train.py:426-452); checkpoint/validation collectives are
    handled separately and still run on every process."""
    enabled = False

    def add_scalar(self, *a, **k):
        pass

    def add_figure(self, *a, **k):
        pass

    def close(self):
        pass


def _device_batch(batch):
    """Strip non-array fields before handing the batch to jit."""
    return {k: v for k, v in batch.items()
            if k in ("image", "depth", "semantics", "instance_labels", "instance_areas")}


def _local_np(a, dtype=None):
    """Fetch a jax.Array to host as THIS process's batch rows. Under
    jax.distributed a global batch spans non-addressable devices and plain
    np.asarray raises (found by the real 2-process run); concatenating the
    addressable shards in index order gives the local sub-batch, which is
    exactly what the reference's per-rank figure logging shows."""
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        # dedupe by shard index: on a ('data','model') mesh a P('data')
        # batch is replicated over the model axis, so each row block
        # appears model-size times among the addressable shards
        uniq = {s.index[0].start or 0: s for s in a.addressable_shards}
        shards = [uniq[k] for k in sorted(uniq)]
        a = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(a, dtype=dtype) if dtype else np.asarray(a)


def _log_qual_figure(logger, graph_builder, tag, args, batch, pred, step):
    """Build + emit one qualitative grid (reference train.py:437-452): RGB,
    GT, pred, and colorized raw cue maps when the run uses them."""
    if not getattr(logger, "enabled", True):
        return                     # non-zero rank: skip the matplotlib work
    sem_color = None
    inst_color = None
    if args.use_semantics is not None and "semantics" in batch:
        sem_color = visualize_semantics(_local_np(batch["semantics"]))
    if args.use_instance_segmentation is not None and "instance_labels" in batch:
        inst_color = visualize_semantics(_local_np(batch["instance_labels"]))
    graph_builder.add_image(_local_np(batch["image"]),
                            _local_np(batch["depth"]),
                            _local_np(pred, dtype=np.float32),
                            semantics=sem_color, instance_labels=inst_color)
    logger.add_figure(tag, graph_builder.fig, step)
    graph_builder.reset()
