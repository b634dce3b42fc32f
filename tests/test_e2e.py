"""End-to-end smoke: main_train for a few steps on a synthetic NYUD2 tree,
checkpoint write/read, then the evaluate driver over the same tree."""

import os
import types

import numpy as np
import pytest
from PIL import Image

# small "NYU" frames (must survive the 45:472/43:608 boundary crop and still
# fit a 96x128 random crop) while keeping CPU compiles fast
H_FULL, W_FULL = 240, 320


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Train frames big enough to survive the NYU boundary crop + random crop;
    eval frames exactly the train-crop size so the mViT token count (hence the
    query-channel truncation at tiny sizes) matches between train and eval."""
    root = tmp_path_factory.mktemp("nyu_e2e")
    scene = root / "office_0001"
    scene.mkdir()
    rng = np.random.default_rng(0)
    lines, eval_lines = [], []
    for i in range(4):
        rgb = rng.integers(0, 255, (H_FULL, W_FULL, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(scene / f"rgb_{i:05d}.jpg")
        depth = rng.integers(400, 9000, (H_FULL, W_FULL)).astype(np.uint16)
        Image.fromarray(depth).save(scene / f"sync_depth_{i:05d}.png")
        lines.append(f"/office_0001/rgb_{i:05d}.jpg /office_0001/sync_depth_{i:05d}.png 518.8579")

        rgb_e = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        Image.fromarray(rgb_e).save(scene / f"rgb_eval_{i:05d}.jpg")
        depth_e = rng.integers(400, 9000, (96, 128)).astype(np.uint16)
        Image.fromarray(depth_e).save(scene / f"sync_depth_eval_{i:05d}.png")
        eval_lines.append(
            f"/office_0001/rgb_eval_{i:05d}.jpg /office_0001/sync_depth_eval_{i:05d}.png 518.8579")
    split = root / "split.txt"
    split.write_text("\n".join(lines) + "\n")
    eval_split = root / "eval_split.txt"
    eval_split.write_text("\n".join(eval_lines) + "\n")
    return root, split, eval_split


def _args(root, split, tmpdir, eval_split=None, **kw):
    base = dict(
        dataset="nyu", data_path=str(root), gt_path=str(root),
        filenames_file=str(split),
        filenames_file_eval=str(eval_split if eval_split is not None else split),
        data_path_eval=str(root), gt_path_eval=str(root),
        input_height=96, input_width=128, do_kb_crop=False,
        do_random_rotate=True, degree=2.5, use_semantics=None,
        use_instance_segmentation=None, insertion_point="before-attn",
        image="rgb", bs=2, batch_size=2, num_threads=2, seed=7,
        use_right=False, encoder_name="efficientnet-b1", n_bins=8,
        min_depth=1e-3, max_depth=10.0, min_depth_eval=1e-3, max_depth_eval=10.0,
        norm="linear", lr=3.57e-4, wd=0.1, div_factor=25.0, final_div_factor=100.0,
        epochs=1, w_chamfer=0.1, chamfer=True, same_lr=False,
        validate_every=2, garg_crop=False, eigen_crop=False,
        name="smoke", root=str(tmpdir), exp_dir=None, tags="", distributed=False,
        use_new_batching=False, mesh_shape="2", compute_dtype="float32",
        pretrained_backbone=None, workers=2, max_val_batches=2, save_dir=None,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_train_and_eval_smoke(tree, tmp_path):
    from mde_tpu.train.driver import main_train
    from mde_tpu.evaluate import evaluate

    root, split, eval_split = tree
    args = _args(root, split, tmp_path, eval_split)
    state = main_train(args, max_steps=2, interactive=False)
    assert state is not None
    # checkpoints + event log exist
    exp_dir = args.exp_dir
    entries = os.listdir(exp_dir)
    assert any("latest" in e for e in entries), entries
    assert "events.jsonl" in entries

    # qualitative figure grids were emitted: step-0 Train/QualSamples and the
    # validation-time Test/QualSamples (reference train.py:437-452, 476-490)
    import json
    events = [json.loads(l) for l in open(os.path.join(exp_dir, "events.jsonl"))]
    fig_tags = {e["tag"] for e in events if "figure" in e}
    assert "Train/QualSamples" in fig_tags, fig_tags
    assert "Test/QualSamples" in fig_tags, fig_tags
    for e in events:
        if "figure" in e:
            assert os.path.exists(e["figure"]), e

    # evaluate with the in-memory state (nyu crop indices exceed the tiny
    # frame, so run uncropped)
    args2 = _args(root, split, tmp_path, eval_split)
    metrics = evaluate(args2, state=state, max_batches=2)
    for k in ("a1", "abs_rel", "rmse"):
        assert k in metrics and np.isfinite(metrics[k])


def test_checkpoint_roundtrip(tree, tmp_path):
    import jax
    import jax.numpy as jnp
    import optax
    from mde_tpu.checkpoint import save_checkpoint, load_checkpoint
    from mde_tpu.train.state import TrainState

    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    state = TrainState.create(apply_fn=lambda *a: None, params=params,
                              tx=optax.adamw(1e-3), batch_stats={"bn": jnp.ones((2,))})
    path = save_checkpoint(state, 3, "ckpt_test", root=str(tmp_path))
    restored, epoch = load_checkpoint(path, state)
    assert epoch == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))


def test_train_smoke_multi_dispatch(tree, tmp_path):
    """main_train with --steps_per_dispatch 2: the grouped scan path must
    drive the same bookkeeping (scalars, figures, validation checkpoint)."""
    from mde_tpu.train.driver import main_train

    root, split, eval_split = tree
    args = _args(root, split, tmp_path, eval_split, steps_per_dispatch=2)
    state = main_train(args, max_steps=4, interactive=False)
    assert state is not None
    exp_dir = args.exp_dir
    entries = os.listdir(exp_dir)
    assert any("latest" in e for e in entries), entries
    import json
    events = [json.loads(l) for l in open(os.path.join(exp_dir, "events.jsonl"))]
    scalar_steps = {e["step"] for e in events if e.get("tag") == "Train/Loss"}
    assert 0 in scalar_steps  # per-step cadence preserved inside the window
    fig_tags = {e["tag"] for e in events if "figure" in e}
    assert "Train/QualSamples" in fig_tags, fig_tags
