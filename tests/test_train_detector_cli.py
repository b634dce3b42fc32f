"""End-to-end drive of the detector-training CLI (scripts/train_detector.py)
on a synthetic 2-image COCO dataset — the capability of the reference's
Swin…/tools/train.py entry point (dataset json parsing, AutoAugment batching,
paramwise AdamW wiring, checkpointing), not just the compute_losses core that
tests/test_detector_train_step.py covers.

Scales are pinned tiny via the detection_data module globals so the DETR-style
policy is exercised without upscaling the toy images to 480p on this 1-core
CI host.
"""

import json
import os
import runpy
import sys

import numpy as np
import pytest


def _write_coco(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(2):
        name = f"im{i}.png"
        arr = rng.integers(0, 255, (64, 96, 3), np.uint8)
        Image.fromarray(arr.astype(np.uint8)).save(img_dir / name)
        images.append(dict(id=i + 1, file_name=name, height=64, width=96))
        # one polygon-mask annotation + one bbox-only annotation per image
        annotations.append(dict(
            id=ann_id, image_id=i + 1, category_id=3,
            bbox=[8, 8, 32, 28], iscrowd=0,
            segmentation=[[8, 8, 40, 8, 40, 36, 8, 36]]))
        annotations.append(dict(
            id=ann_id + 1, image_id=i + 1, category_id=7,
            bbox=[50, 20, 40, 30], iscrowd=0))
        ann_id += 2
    coco = dict(images=images, annotations=annotations,
                categories=[dict(id=c) for c in range(10)])
    ann_path = tmp_path / "inst.json"
    ann_path.write_text(json.dumps(coco))
    return str(img_dir), str(ann_path)


def test_train_detector_cli_end_to_end(tmp_path, monkeypatch, capsys):
    import mde_tpu.offline.detection_data as dd

    img_dir, ann_path = _write_coco(tmp_path)
    # pin the AutoAugment scale set so 64x96 inputs stay 64x96
    monkeypatch.setattr(dd, "SCALES_MAIN", [(64, 96)])
    monkeypatch.setattr(dd, "SCALES_PRE_CROP", [(64, 96)])
    monkeypatch.setattr(dd, "CROP_RANGE", (48, 64))
    out_dir = str(tmp_path / "run")
    argv = ["train_detector.py", "--images", img_dir,
            "--annotations", ann_path, "--num-classes", "10",
            "--epochs", "1", "--max-steps", "2", "--max-gt", "8",
            "--log-every", "1", "--out", out_dir]
    monkeypatch.setattr(sys, "argv", argv)
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "train_detector.py")
    runpy.run_path(script, run_name="__main__")
    printed = capsys.readouterr().out
    assert "2 annotated images" in printed
    assert "done" in printed
    # per-step logging fired with finite losses
    assert "s1: total" in printed and "nan" not in printed
    # epoch checkpoint written and loadable
    ckpts = os.listdir(out_dir)
    assert any("detector_latest" in c for c in ckpts), ckpts
