"""Batched eval must aggregate exactly like the reference's bs=1 protocol
(per-image metric means, not pixel-pooled)."""

import types

import numpy as np
import pytest
from PIL import Image

H, W = 96, 128


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("nyu_evalbatch")
    scene = root / "office_0001"
    scene.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)).save(
            scene / f"rgb_{i:05d}.jpg")
        Image.fromarray(rng.integers(400, 9000, (H, W)).astype(np.uint16)).save(
            scene / f"sync_depth_{i:05d}.png")
        lines.append(f"/office_0001/rgb_{i:05d}.jpg /office_0001/sync_depth_{i:05d}.png 518.8579")
    split = root / "split.txt"
    split.write_text("\n".join(lines) + "\n")
    return root, split


def _args(root, split, bs):
    return types.SimpleNamespace(
        dataset="nyu", data_path=str(root), gt_path=str(root),
        filenames_file=str(split), filenames_file_eval=str(split),
        data_path_eval=str(root), gt_path_eval=str(root),
        input_height=H, input_width=W, do_kb_crop=False, do_random_rotate=False,
        degree=0.0, use_semantics=None, use_instance_segmentation=None,
        image="rgb", batch_size=2, num_threads=2, seed=7, use_right=False,
        encoder_name="efficientnet-b1", n_bins=8, min_depth=1e-3, max_depth=10.0,
        min_depth_eval=1e-3, max_depth_eval=10.0, norm="linear",
        insertion_point="before-attn", garg_crop=False, eigen_crop=False,
        save_dir=None, eval_batch_size=bs, checkpoint_path=None)


def test_batched_eval_matches_bs1(tree):
    import jax
    import jax.numpy as jnp
    import optax
    from mde_tpu.evaluate import evaluate
    from mde_tpu.models import build_model
    from mde_tpu.train.state import TrainState

    root, split = tree
    args1 = _args(root, split, bs=1)
    model = build_model(args1, dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, H, W, 3)))
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=optax.identity(),
                              batch_stats=variables.get("batch_stats", {}))

    m1 = evaluate(args1, state=state)
    m2 = evaluate(_args(root, split, bs=2), state=state)
    for k in m1:
        assert abs(m1[k] - m2[k]) < 2e-3, (k, m1[k], m2[k])


def test_validate_masks_invalid_samples_per_image(tree):
    """A batch mixing valid and invalid-GT samples must contribute exactly its
    valid samples (reference skips invalid samples individually at bs=1,
    train.py:516-518) — not be dropped wholesale."""
    import jax
    import jax.numpy as jnp
    import optax
    from mde_tpu.models import build_model
    from mde_tpu.train.loop import make_eval_step, validate
    from mde_tpu.train.state import TrainState

    root, split = tree
    args = _args(root, split, bs=2)
    model = build_model(args, dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, H, W, 3)))
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=optax.identity(),
                              batch_stats=variables.get("batch_stats", {}))
    eval_step = make_eval_step(model, args, None, None)

    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, H, W, 3)).astype(np.float32)
    depth = (rng.random((2, H, W, 1)) * 9.0 + 0.5).astype(np.float32)
    depth[1] = 0.0  # the invalid sample carries no usable GT
    mixed = {"image": img, "depth": depth,
             "has_valid_depth": np.array([True, False])}
    only_valid = {"image": np.repeat(img[:1], 2, axis=0),
                  "depth": np.repeat(depth[:1], 2, axis=0),
                  "has_valid_depth": np.array([True, True])}

    m_mixed, si_mixed = validate(args, eval_step, state, [mixed])
    m_ref, si_ref = validate(args, eval_step, state, [only_valid])
    for k in m_ref:
        np.testing.assert_allclose(m_mixed[k], m_ref[k], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(si_mixed.get_value(), si_ref.get_value(),
                               rtol=1e-5)
    assert np.isfinite(si_mixed.get_value())

    # an all-invalid batch is skipped entirely
    none_valid = {"image": img, "depth": depth,
                  "has_valid_depth": np.array([False, False])}
    m_none, si_none = validate(args, eval_step, state, [none_valid])
    assert all(np.isnan(v) for v in m_none.values())

def test_bf16_eval_opt_in_close_to_f32(tree):
    """--compute_dtype bfloat16 (the serving-throughput opt-in; eval defaults
    to float32 for reference parity) runs the same protocol and lands within
    bf16 tolerance of the f32 metrics."""
    import jax
    import jax.numpy as jnp
    import optax
    from mde_tpu.evaluate import evaluate
    from mde_tpu.models import build_model
    from mde_tpu.train.state import TrainState

    root, split = tree
    args = _args(root, split, bs=2)
    model = build_model(args, dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, H, W, 3)))
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=optax.identity(),
                              batch_stats=variables.get("batch_stats", {}))

    m32 = evaluate(args, state=state)
    args_bf = _args(root, split, bs=2)
    args_bf.compute_dtype = "bfloat16"
    m16 = evaluate(args_bf, state=state)
    for k in m32:
        assert np.isfinite(m16[k]), k
        # random-init preds are near-constant, so relative metric values are
        # tiny; bf16 drift stays within a few percent of the f32 value
        assert abs(m16[k] - m32[k]) <= max(0.05 * abs(m32[k]), 5e-3), \
            (k, m32[k], m16[k])
