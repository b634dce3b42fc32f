"""Data-pipeline tests on a synthetic NYUD2-style tree (SURVEY.md §4:
dataset tests over tiny jpg/png/npy/npz trees mirroring the reference's
path-derivation rules at dataloader.py:98-113)."""

import os
import types

import numpy as np
import pytest
torch = pytest.importorskip("torch")  # noqa: F401  (oracle in some tests)
from PIL import Image

from mde_tpu.data import DepthDataLoader, DepthDataset
from mde_tpu.data.transforms import rotate, augment_image, normalize_image

H_FULL, W_FULL = 480, 640


@pytest.fixture(scope="module")
def nyu_tree(tmp_path_factory):
    """Synthetic scene tree: rgb jpg + uint16 sync_depth png + cue side files."""
    root = tmp_path_factory.mktemp("nyu")
    scene = root / "kitchen_0001"
    scene.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        rgb = rng.integers(0, 255, (H_FULL, W_FULL, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(scene / f"rgb_{i:05d}.jpg")
        depth = rng.integers(400, 9000, (H_FULL, W_FULL)).astype(np.uint16)
        Image.fromarray(depth).save(scene / f"sync_depth_{i:05d}.png")
        sem = rng.integers(0, 150, (H_FULL, W_FULL)).astype(np.uint8)
        np.save(scene / f"semantic_seg_{i:05d}.npy", sem)
        inst_lab = rng.integers(-1, 100, (H_FULL, W_FULL)).astype(np.int32)
        np.savez_compressed(scene / f"instance_labels_ade20k_swin_{i:05d}.npz", inst_lab)
        inst_area = rng.integers(0, 5000, (H_FULL, W_FULL)).astype(np.int32)
        np.savez_compressed(scene / f"instance_areas_ade20k_swin_{i:05d}.npz", inst_area)
        lines.append(f"/kitchen_0001/rgb_{i:05d}.jpg /kitchen_0001/sync_depth_{i:05d}.png 518.8579")
    # one "empty prediction" npz (None payload) to exercise the fallback
    np.savez_compressed(scene / "instance_labels_ade20k_swin_00000.npz",
                        np.array(None, dtype=object))
    split = root / "train.txt"
    split.write_text("\n".join(lines) + "\n")
    return root, split


def _args(root, split, **kw):
    base = dict(dataset="nyu", data_path=str(root), gt_path=str(root),
                filenames_file=str(split), filenames_file_eval=str(split),
                data_path_eval=str(root), gt_path_eval=str(root),
                input_height=416, input_width=544, do_kb_crop=False,
                do_random_rotate=True, degree=2.5, use_semantics=None,
                use_instance_segmentation=None, image="rgb", batch_size=2,
                num_threads=2, seed=7, use_right=False)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_train_sample_shapes(nyu_tree):
    root, split = nyu_tree
    ds = DepthDataset(_args(root, split), "train", seed=1)
    s = ds[1]
    assert s["image"].shape == (416, 544, 3)
    assert s["depth"].shape == (416, 544, 1)
    assert s["image"].dtype == np.float32
    assert 0 < s["depth"].max() <= 10.0  # mm -> m
    assert s["focal"] == np.float32(518.8579)


def test_train_with_cues_shapes(nyu_tree):
    root, split = nyu_tree
    args = _args(root, split, use_semantics="glove-25d",
                 use_instance_segmentation="ade20k_swin")
    ds = DepthDataset(args, "train", seed=1)
    s = ds[1]
    assert s["semantics"].shape == (416, 544, 1)
    assert s["semantics"].dtype == np.int32
    assert s["instance_labels"].shape == (416, 544, 1)
    assert s["instance_areas"].shape == (416, 544, 1)


def test_empty_npz_fallback(nyu_tree):
    root, split = nyu_tree
    args = _args(root, split, use_instance_segmentation="ade20k_swin",
                 do_random_rotate=False)
    ds = DepthDataset(args, "train", seed=1)
    s = ds[0]  # index 0 has the None-payload npz
    assert np.all(s["instance_labels"] == -1)


def test_determinism_and_epoch_variation(nyu_tree):
    root, split = nyu_tree
    ds = DepthDataset(_args(root, split), "train", seed=3)
    a = ds[2]["image"]
    b = ds[2]["image"]
    np.testing.assert_array_equal(a, b)
    ds.set_epoch(1)
    c = ds[2]["image"]
    assert not np.array_equal(a, c)


def test_eval_sample_full_frame(nyu_tree):
    root, split = nyu_tree
    ds = DepthDataset(_args(root, split), "online_eval", seed=1)
    s = ds[0]
    assert s["image"].shape == (H_FULL, W_FULL, 3)
    assert s["depth"].shape == (H_FULL, W_FULL, 1)
    assert s["has_valid_depth"] is True
    assert s["image_path"].endswith("rgb_00000.jpg")


def test_loader_batching(nyu_tree):
    root, split = nyu_tree
    loader = DepthDataLoader(_args(root, split), "train")
    assert len(loader) == 1  # 3 samples, bs 2, drop_last
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 416, 544, 3)
    assert batch["depth"].shape == (2, 416, 544, 1)


def test_missing_depth_flags_invalid(nyu_tree, tmp_path):
    root, split = nyu_tree
    bad_split = tmp_path / "bad.txt"
    bad_split.write_text("/kitchen_0001/rgb_00000.jpg /kitchen_0001/nope.png 518.8579\n")
    args = _args(root, split)
    args.filenames_file_eval = str(bad_split)
    ds = DepthDataset(args, "online_eval", seed=1)
    assert ds[0]["has_valid_depth"] is False


def test_rotate_matches_pil():
    rng = np.random.default_rng(0)
    img = rng.random((40, 60, 3), dtype=np.float32)
    for angle in (-2.5, 1.3, 2.5):
        ours = rotate(img, angle, nearest=False)
        ref = np.asarray(Image.fromarray((img * 255).astype(np.uint8)).rotate(
            angle, resample=Image.BILINEAR), dtype=np.float32) / 255.0
        # uint8 quantization in the PIL path dominates the tolerance
        assert np.abs(ours - ref).mean() < 0.02

    labels = rng.integers(0, 150, (40, 60)).astype(np.int32)
    ours_n = rotate(labels, 2.0, nearest=True, fill=0)
    ref_n = np.asarray(Image.fromarray(labels, mode="I").rotate(
        2.0, resample=Image.NEAREST))
    assert (ours_n != ref_n).mean() < 0.02  # border rounding differences only


def test_normalize_imagenet_formula():
    rng = np.random.default_rng(1)
    img = rng.random((8, 9, 3), dtype=np.float32)
    ours = normalize_image(img)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(ours, (img - mean) / std, atol=1e-6)


def test_augment_ranges():
    rng = np.random.default_rng(2)
    img = rng.random((16, 16, 3), dtype=np.float32)
    out = augment_image(rng, img, "nyu")
    assert out.min() >= 0.0 and out.max() <= 1.0
