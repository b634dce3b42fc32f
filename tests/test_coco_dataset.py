"""COCO-format dataset tests over a synthetic json + image tree
(SURVEY.md §4: dataset tests with mock annotations and tmp-dir fixtures)."""

import json

import numpy as np
import pytest
from PIL import Image

from mde_tpu.offline.coco_dataset import CocoInstanceDataset, _decode_segmentation


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(2):
        name = f"im_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)).save(root / name)
        images.append({"id": i + 1, "file_name": name, "height": 120, "width": 160})
        annotations.append({
            "id": 10 * i + 1, "image_id": i + 1, "category_id": 5,
            "bbox": [10, 20, 50, 40], "iscrowd": 0, "area": 2000,
            "segmentation": [[10, 20, 60, 20, 60, 60, 10, 60]],
        })
        annotations.append({
            "id": 10 * i + 2, "image_id": i + 1, "category_id": 9,
            "bbox": [80, 30, 40, 60], "iscrowd": 0, "area": 2400,
            "segmentation": [[80, 30, 120, 30, 120, 90, 80, 90]],
        })
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 5, "name": "chair"}, {"id": 9, "name": "table"}]}
    path = root / "instances.json"
    path.write_text(json.dumps(ann))
    return root, path


def test_dataset_load(coco_tree):
    root, ann = coco_tree
    ds = CocoInstanceDataset(str(root), str(ann))
    assert len(ds) == 2
    img, boxes, labels, masks = ds[0]
    assert img.shape == (120, 160, 3)
    assert boxes.shape == (2, 4)
    np.testing.assert_array_equal(labels, [0, 1])  # cat ids 5,9 -> 0,1
    assert masks.shape == (2, 120, 160)
    # polygon mask roughly covers the box area
    assert masks[0, 40, 30] == 1 and masks[0, 100, 100] == 0


def test_train_sample_static_contract(coco_tree):
    root, ann = coco_tree
    ds = CocoInstanceDataset(str(root), str(ann))
    rng = np.random.default_rng(1)
    s = ds.train_sample(rng, 0, max_gt=8)
    assert s["gt_boxes"].shape == (8, 4)
    assert s["gt_valid"].sum() == 2
    assert s["image"].shape[0] % 32 == 0
    assert s["gt_masks"].shape[0] == 8


def test_rle_decode():
    # column-major uncompressed RLE: 2x3 mask (h=2, w=3)
    seg = {"counts": [1, 2, 3], "size": [2, 3]}
    m = _decode_segmentation(seg, 2, 3)
    # flat column-major: [0, 1, 1, 0, 0, 0] -> cols [[0,1],[1,0],[0,0]]
    np.testing.assert_array_equal(m, [[0, 1, 0], [1, 0, 0]])
