"""Native C++ augmentation engine tests: build, numeric parity with the numpy
path, and loader integration."""

import types

import numpy as np
import pytest
from PIL import Image

from mde_tpu.data import DepthDataLoader, DepthDataset
from mde_tpu.data.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")

H_FULL, W_FULL = 480, 640


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("nyu_native")
    scene = root / "kitchen_0001"
    scene.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (H_FULL, W_FULL, 3),
                                     dtype=np.uint8)).save(scene / f"rgb_{i:05d}.jpg")
        Image.fromarray(rng.integers(400, 9000, (H_FULL, W_FULL)).astype(
            np.uint16)).save(scene / f"sync_depth_{i:05d}.png")
        np.save(scene / f"semantic_seg_{i:05d}.npy",
                rng.integers(0, 150, (H_FULL, W_FULL)).astype(np.uint8))
        lines.append(f"/kitchen_0001/rgb_{i:05d}.jpg /kitchen_0001/sync_depth_{i:05d}.png 518.8579")
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
                num_threads=2, seed=7, use_right=False, no_native_aug=False)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_native_lib_builds():
    lib = get_lib()
    assert lib.mdeaug_version() == 1


def test_native_matches_numpy_path(tree):
    root, split = tree
    args_native = _args(root, split)
    args_numpy = _args(root, split, no_native_aug=True)

    native_batch = next(iter(DepthDataLoader(args_native, "train")))
    numpy_batch = next(iter(DepthDataLoader(args_numpy, "train")))

    assert native_batch["image"].shape == numpy_batch["image"].shape
    # identical rng sequence -> identical geometry; interpolation differs only
    # by float rounding
    img_diff = np.abs(native_batch["image"] - numpy_batch["image"])
    assert img_diff.mean() < 5e-3, img_diff.mean()
    d_diff = np.abs(native_batch["depth"] - numpy_batch["depth"])
    assert (d_diff > 1e-4).mean() < 0.02  # nearest-rotation edge rounding only
    np.testing.assert_allclose(native_batch["focal"], numpy_batch["focal"])


def test_native_with_semantics(tree):
    root, split = tree
    args = _args(root, split, use_semantics="glove-25d")
    batch = next(iter(DepthDataLoader(args, "train")))
    assert batch["semantics"].shape == (2, 416, 544, 1)
    assert batch["semantics"].dtype == np.int32

    args_np = _args(root, split, use_semantics="glove-25d", no_native_aug=True)
    ref = next(iter(DepthDataLoader(args_np, "train")))
    mismatch = (batch["semantics"] != ref["semantics"]).mean()
    assert mismatch < 0.02, mismatch


def test_native_deterministic(tree):
    root, split = tree
    args = _args(root, split)
    b1 = next(iter(DepthDataLoader(args, "train")))
    b2 = next(iter(DepthDataLoader(args, "train")))
    np.testing.assert_array_equal(b1["image"], b2["image"])
