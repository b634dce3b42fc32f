"""KITTI path tests: kb_crop geometry, depth/256 scaling, use_right selection,
garg eval crop (SURVEY.md §7.10 / BASELINE config #5 path)."""

import types

import numpy as np
import pytest
from PIL import Image

from mde_tpu.data import DepthDataset, DepthDataLoader
from mde_tpu.ops.metrics import eval_mask

KH, KW = 375, 1242  # typical KITTI frame


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    scene = root / "2011_09_26_drive_0001"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        for side in ("image_02", "image_03"):
            (scene / side).mkdir(exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (KH, KW, 3), dtype=np.uint8)).save(
                scene / side / f"{i:010d}.jpg")
        (scene / "proj_depth").mkdir(exist_ok=True)
        depth = rng.integers(0, 80 * 256, (KH, KW)).astype(np.uint16)
        Image.fromarray(depth).save(scene / "proj_depth" / f"{i:010d}.png")
        lines.append(
            f"/2011_09_26_drive_0001/image_02/{i:010d}.jpg "
            f"/2011_09_26_drive_0001/proj_depth/{i:010d}.png 721.5377 "
            f"/2011_09_26_drive_0001/image_03/{i:010d}.jpg "
            f"/2011_09_26_drive_0001/proj_depth/{i:010d}.png")
    split = root / "split.txt"
    split.write_text("\n".join(lines) + "\n")
    return root, split


def _args(root, split, **kw):
    base = dict(dataset="kitti", data_path=str(root), gt_path=str(root),
                filenames_file=str(split), filenames_file_eval=str(split),
                data_path_eval=str(root), gt_path_eval=str(root),
                input_height=352, input_width=704, do_kb_crop=True,
                do_random_rotate=True, degree=1.0, use_semantics=None,
                use_instance_segmentation=None, image="rgb", batch_size=2,
                num_threads=2, seed=7, use_right=True, no_native_aug=True)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_kitti_train_sample(kitti_tree):
    root, split = kitti_tree
    ds = DepthDataset(_args(root, split), "train", seed=1)
    s = ds[0]
    assert s["image"].shape == (352, 704, 3)
    # kb_crop to 352x1216 happened before the random crop
    assert s["depth"].max() <= 80 * 256 / 256.0 + 1e-6  # /256 scaling


def test_kitti_use_right_draws_both_sides(kitti_tree):
    root, split = kitti_tree
    args = _args(root, split)
    ds = DepthDataset(args, "train", seed=1)
    # across epochs the right-image branch (p=0.5) must trigger at least once
    triggered = False
    for epoch in range(6):
        ds.set_epoch(epoch)
        rng = ds._rng(0)
        if rng.random() > 0.5:
            triggered = True
    assert triggered


def test_kitti_eval_kb_crop(kitti_tree):
    root, split = kitti_tree
    ds = DepthDataset(_args(root, split), "online_eval", seed=1)
    s = ds[0]
    assert s["image"].shape == (352, 1216, 3)
    assert s["depth"].shape == (352, 1216, 1)


def test_garg_crop_mask():
    m = eval_mask((352, 1216), dataset="kitti", garg_crop=True, eigen_crop=False)
    ys, xs = np.nonzero(m)
    assert ys.min() == int(0.40810811 * 352)
    assert xs.min() == int(0.03594771 * 1216)


def test_kitti_native_matches_numpy(kitti_tree):
    from mde_tpu.data.native import get_lib
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    root, split = kitti_tree
    # use_right draws differ in path selection; disable for strict parity
    a_native = _args(root, split, no_native_aug=False, use_right=False)
    a_numpy = _args(root, split, no_native_aug=True, use_right=False)
    b_native = next(iter(DepthDataLoader(a_native, "train")))
    b_numpy = next(iter(DepthDataLoader(a_numpy, "train")))
    assert np.abs(b_native["image"] - b_numpy["image"]).mean() < 5e-3
    assert (np.abs(b_native["depth"] - b_numpy["depth"]) > 1e-4).mean() < 0.02
