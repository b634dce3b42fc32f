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


def train_state_sharding(state, mesh: Mesh):
    """Sharding pytree for a TrainState: tensor parallelism over the 'model'
    axis when the mesh has one, plain replication otherwise.

    Rule: weight matrices / conv kernels (ndim >= 2) are sharded on their
    output-channel (last) dim when it divides the model-axis size; 1-D leaves
    (biases, BN scales/stats), scalars, and indivisible shapes replicate.
    GSPMD then partitions the matching activations and inserts the ICI
    collectives — no model changes needed. Optimizer moments share the param
    tree structure, so the same shape rule lands them on matching shards.

    The reference has no TP (SURVEY §2.2); this is the TPU-native extension
    the mesh's second axis exists for.
    """
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def spec(leaf):
        shape = getattr(leaf, "shape", None)
        if (n_model > 1 and shape is not None and len(shape) >= 2
                and shape[-1] % n_model == 0 and shape[-1] >= n_model):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, state)


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
