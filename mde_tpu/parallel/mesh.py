"""Device mesh + sharding layout — the TPU-native replacement for the
reference's entire L1 parallelism layer.

The reference implements data parallelism three ways (DDP with NCCL
all-reduce, single-process DataParallel, SLURM multi-node rendezvous —
reference train.py:275-305, 604-636) plus SyncBatchNorm conversion
(train.py:296). Under jit + GSPMD all of that collapses into one layout
choice: batches are sharded over a `data` mesh axis, parameters are
replicated, and XLA emits the gradient all-reduce (psum over ICI) and the
cross-replica batch-norm moments automatically — batch statistics are
computed over the *global* batch axis because that is what the program says.

An optional `model` axis is exposed so tensor-parallel sharding of the
encoder/mViT is a config change (SURVEY.md §2.2), not new machinery.

Multi-host: call `maybe_init_distributed()` once per process;
jax.distributed wires DCN, and the same mesh spans all hosts.
"""

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(args) -> None:
    """Multi-host init (replaces SLURM/TCP rendezvous at reference
    train.py:604-636). No-op single-host; honors standard JAX env vars."""
    if getattr(args, "distributed", False) and jax.process_count() == 1 \
            and os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(mesh_shape: Optional[str] = None, devices=None) -> Mesh:
    """Build a ('data',) or ('data','model') mesh.

    mesh_shape: None -> all devices on the data axis; "8" -> data=8;
    "4,2" -> data=4, model=2.
    """
    devices = devices if devices is not None else jax.devices()
    if mesh_shape:
        sizes = [int(s) for s in str(mesh_shape).split(",") if s.strip()]
    else:
        sizes = [len(devices)]
    if len(sizes) == 1:
        arr = np.asarray(devices[: sizes[0]]).reshape(sizes[0])
        return Mesh(arr, ("data",))
    d, m = sizes
    arr = np.asarray(devices[: d * m]).reshape(d, m)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis — the DDP layout."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Targeted tensor-parallel layer set (VERDICT r2 next #6). Blanket last-dim
# sharding of every conv kernel forces an all-gather of full-resolution
# activations after every 3x3 conv — all-gather-bound at any useful scale.
# The targeted set shards only layers whose activations live at coarse
# resolution (/32) or on the ~221-token mViT stream, Megatron-style:
# column-parallel (output dim sharded) into row-parallel (input dim sharded)
# pairs, so GSPMD closes each pair with one psum instead of per-layer
# all-gathers.
_TP_COLUMN = ("conv_head",           # encoder 1x1 head, 1280/2048 out @ /32
              "linear1",             # mViT FFN up-projection
              "in_proj",             # mViT attention qkv
              "conv_out")            # 1x1 bins head: logits stay sharded on
# the bins dim through softmax (two scalar-per-pixel all-reduces) and the
# centers contraction closes with one psum of (B,H,W,1) — never a gather of
# the (B,H,W,n_bins) logits. With --use_fused_head the shard_map wrapper
# instead gathers the (1,1,128,N) kernel + (B,N) centers, both tiny.
_TP_ROW = ("linear2",                # mViT FFN down-projection
           "out_proj")               # mViT attention output


def _path_keys(path):
    return [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]


def train_state_sharding(state, mesh: Mesh, tp_mode: str = "targeted"):
    """Sharding pytree for a TrainState: tensor parallelism over the 'model'
    axis when the mesh has one, plain replication otherwise.

    tp_mode:
      "targeted" (default) — Megatron-style column/row sharding of the layer
        set above; everything else (all 3x3 convs, BN, biases) replicates.
      "all" — round-2's blanket rule (every ndim>=2 kernel sharded on its
        output dim); kept for A/B comparison, measured all-gather-bound
        (scripts/analyze_tp_hlo.py, SCALING.md).

    GSPMD partitions the matching activations and inserts the ICI
    collectives — no model changes needed. Optimizer moments share the param
    tree structure, so the same path rule lands them on matching shards.

    The reference has no TP (SURVEY §2.2); this is the TPU-native extension
    the mesh's second axis exists for.
    """
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    rep = NamedSharding(mesh, P())

    def shard_dim(shape, dim):
        spec = [None] * len(shape)
        spec[dim] = "model"
        return NamedSharding(mesh, P(*spec))

    def spec(path, leaf):
        shape = getattr(leaf, "shape", None)
        if n_model <= 1 or shape is None or len(shape) < 2:
            return rep
        if tp_mode == "all":
            if shape[-1] % n_model == 0 and shape[-1] >= n_model:
                return shard_dim(shape, len(shape) - 1)
            return rep
        keys = _path_keys(path)
        if any(k in _TP_COLUMN for k in keys) and shape[-1] % n_model == 0:
            return shard_dim(shape, len(shape) - 1)
        if any(k in _TP_ROW for k in keys):
            # input dim: 0 for dense (in, out), 2 for conv HWIO
            in_dim = 0 if len(shape) == 2 else len(shape) - 2
            if shape[in_dim] % n_model == 0:
                return shard_dim(shape, in_dim)
        return rep

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_batch_size(global_bs: int, mesh: Mesh, use_new_batching: bool) -> int:
    """Both reference batching policies (train.py:286-293):
    legacy (default): `bs` is global, split across devices;
    use_new_batching: `bs` is per-device."""
    n = mesh.shape["data"]
    if use_new_batching:
        return global_bs * n
    if global_bs % n != 0:
        # round down like int(bs / ngpus) * ngpus in the reference
        return max(n, (global_bs // n) * n)
    return global_bs
