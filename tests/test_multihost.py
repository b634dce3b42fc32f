"""Multi-host data-path unit tests (VERDICT r1: the process_count>1 branches
had no coverage). jax.process_count / process_index are monkeypatched — the
contract under test is pure host-side logic: every host derives the same
permutation from the shared seed and takes a disjoint strided slice
(the DistributedSampler equivalent), local batch = global // process_count,
and the prefetcher routes through make_array_from_process_local_data."""

import types

import jax
import numpy as np
import pytest
from PIL import Image

H, W = 96, 128


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("nyu_multihost")
    scene = root / "office_0001"
    scene.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)).save(
            scene / f"rgb_{i:05d}.jpg")
        Image.fromarray(rng.integers(400, 9000, (H, W)).astype(np.uint16)).save(
            scene / f"sync_depth_{i:05d}.png")
        lines.append(f"/office_0001/rgb_{i:05d}.jpg /office_0001/sync_depth_{i:05d}.png 518.8579")
    split = root / "split.txt"
    split.write_text("\n".join(lines) + "\n")
    return root, split


def _args(root, split, bs=4):
    return types.SimpleNamespace(
        dataset="nyu", data_path=str(root), gt_path=str(root),
        filenames_file=str(split), filenames_file_eval=str(split),
        data_path_eval=str(root), gt_path_eval=str(root),
        input_height=H, input_width=W, do_kb_crop=False, do_random_rotate=False,
        degree=0.0, use_semantics=None, use_instance_segmentation=None,
        image="rgb", batch_size=bs, num_threads=2, seed=7, use_right=False,
        eval_batch_size=1)


def _patch_process(monkeypatch, count, index):
    monkeypatch.setattr(jax, "process_count", lambda: count)
    monkeypatch.setattr(jax, "process_index", lambda: index)


def test_order_strides_are_disjoint_and_complete(tree, monkeypatch):
    from mde_tpu.data import DepthDataLoader

    root, split = tree
    orders = []
    for rank in range(2):
        _patch_process(monkeypatch, 2, rank)
        loader = DepthDataLoader(_args(root, split), "train")
        loader.set_epoch(3)
        orders.append(loader._order())
    assert set(orders[0]).isdisjoint(orders[1])
    assert sorted(np.concatenate(orders).tolist()) == list(range(8))

    # same shared permutation on both ranks: interleaving the strided slices
    # reconstructs it
    _patch_process(monkeypatch, 1, 0)
    full_loader = DepthDataLoader(_args(root, split), "train")
    full_loader.set_epoch(3)
    full = full_loader._order()
    np.testing.assert_array_equal(full[0::2], orders[0])
    np.testing.assert_array_equal(full[1::2], orders[1])


def test_local_batch_is_global_over_processes(tree, monkeypatch):
    from mde_tpu.data import DepthDataLoader

    root, split = tree
    _patch_process(monkeypatch, 2, 0)
    loader = DepthDataLoader(_args(root, split, bs=4), "train")
    assert loader.batch_size == 2
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 2

    # eval is per-host full list (no striding)
    eval_loader = DepthDataLoader(_args(root, split), "online_eval")
    assert len(eval_loader._order()) == 8


def test_prefetcher_uses_process_local_assembly(monkeypatch):
    from mde_tpu.data.prefetch import DevicePrefetcher
    from mde_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh("8", devices=jax.devices()[:8])
    sharding = batch_sharding(mesh)

    calls = []

    def fake_global_array(sh, local):
        calls.append((sh, local.shape))
        return jax.device_put(local, sh)  # stand-in: single-process test

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "make_array_from_process_local_data",
                        fake_global_array)

    batches = [{"image": np.zeros((8, 4, 4, 3), np.float32),
                "meta": "host-only-field"}]
    out = list(DevicePrefetcher(batches, sharding=sharding))
    assert len(out) == 1
    assert calls and calls[0][0] is sharding and calls[0][1] == (8, 4, 4, 3)
    assert out[0]["meta"] == "host-only-field"


def test_run_id_broadcast_and_rank0_logging(monkeypatch, tmp_path):
    """The three multi-host driver behaviors the REAL 2-process run
    (scripts/run_multihost_cpu.py, 2026-08-20) flushed out, pinned at the
    unit level: (1) every process adopts process-0's run_id so orbax's
    _async_write_complete barrier names agree; (2) only process 0 gets a
    real SummaryLogger; (3) _local_np degrades to np.asarray on
    fully-addressable arrays (single-process figure path unchanged)."""
    from jax._src import distributed as _dist

    from mde_tpu.train import driver as drv

    # (1) run_id adoption via the coordinator KV store (no device
    # collective): rank 1 adopts what rank 0 published, rank 0 publishes
    # its own id under a name-scoped key. Keys carry a per-process
    # invocation counter (each main_train call in one jax.distributed
    # session gets a fresh key); both simulated ranks here are their
    # first invocation, so reset the counter between them.
    rank0_id = "20-Aug_99-99-nodebs8-tep1-lr0.001-wd0.1-cafecafe"
    store = {"mde_tpu/run_id/exp/1": rank0_id}

    class _Client:
        def key_value_set(self, k, v):
            if k in store:
                raise RuntimeError("key exists: " + k)  # real client raises
            store[k] = v

        def blocking_key_value_get(self, k, timeout_ms):
            return store[k]

    monkeypatch.setattr(_dist.global_state, "client", _Client(),
                        raising=False)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    args = types.SimpleNamespace(name="exp", root="/tmp", bs=8, lr=1e-3,
                                 wd=0.1, epochs=1)
    drv._agree_run_id._calls = 0
    assert drv._agree_run_id(args) == rank0_id
    # rank 0 publishes (and keeps) its own — a SECOND invocation must go
    # under a fresh counter-scoped key instead of colliding (ADVICE r4)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    got = drv._agree_run_id(args)
    assert store["mde_tpu/run_id/exp/2"] == got

    # (2) rank-1 logger is the null logger and the figure builder skips work
    lg = drv._NullLogger()
    assert not getattr(lg, "enabled", True)
    lg.add_scalar("x", 1.0, 0)
    lg.add_figure("y", None, 0)
    lg.close()
    called = []

    class _Builder:
        def add_image(self, *a, **k):
            called.append("built")

    drv._log_qual_figure(lg, _Builder(), "t", None, {}, None, 0)
    assert called == []   # early-returned before touching arrays

    # (3) single-process passthrough of _local_np
    x = jax.numpy.arange(6.0).reshape(3, 2)
    np.testing.assert_array_equal(drv._local_np(x), np.asarray(x))
    np.testing.assert_array_equal(
        drv._local_np(np.ones((2, 2)), dtype=np.float32),
        np.ones((2, 2), np.float32))
