"""Detection mAP evaluator tests against hand-computed cases."""

import numpy as np

from mde_tpu.offline.detection_eval import (DetectionEvaluator,
                                            average_precision, _iou_matrix)


def test_iou_matrix():
    a = np.asarray([[0, 0, 10, 10.0]])
    b = np.asarray([[0, 0, 10, 10.0], [5, 5, 15, 15.0]])
    iou = _iou_matrix(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25 / 175, rtol=1e-6)


def test_average_precision_perfect():
    ap = average_precision([0.9, 0.8], [True, True], num_gt=2)
    np.testing.assert_allclose(ap, 1.0, atol=1e-6)


def test_average_precision_half():
    # one TP (recall .5) at precision 1, one FN: AP = ~0.5 (101-pt)
    ap = average_precision([0.9], [True], num_gt=2)
    assert 0.49 < ap < 0.52


def test_evaluator_perfect_detections():
    ev = DetectionEvaluator(num_classes=3)
    gts = {"boxes": np.asarray([[0, 0, 10, 10], [20, 20, 40, 40.0]]),
           "labels": np.asarray([0, 2])}
    dets = {"boxes": gts["boxes"].copy(),
            "scores": np.asarray([0.9, 0.8]),
            "labels": np.asarray([0, 2])}
    ev.add_image(dets, gts)
    s = ev.summarize()
    np.testing.assert_allclose(s["bbox_mAP"], 1.0, atol=1e-6)
    np.testing.assert_allclose(s["bbox_mAP50"], 1.0, atol=1e-6)


def test_evaluator_localization_quality_matters():
    ev = DetectionEvaluator(num_classes=1)
    gts = {"boxes": np.asarray([[0, 0, 10, 10.0]]), "labels": np.asarray([0])}
    # IoU = 0.82 detection: matches thresholds .5-.8 (7 of 10)
    dets = {"boxes": np.asarray([[0, 0, 10, 8.2]]),
            "scores": np.asarray([0.9]), "labels": np.asarray([0])}
    ev.add_image(dets, gts)
    s = ev.summarize()
    assert s["bbox_mAP50"] > 0.99
    assert 0.65 < s["bbox_mAP"] < 0.75   # 7/10 thresholds matched


def test_evaluator_masks():
    ev = DetectionEvaluator(num_classes=1, with_masks=True)
    m = np.zeros((1, 20, 20), bool)
    m[0, :10, :10] = True
    gts = {"boxes": np.asarray([[0, 0, 10, 10.0]]), "labels": np.asarray([0]),
           "masks": m}
    dets = {"boxes": gts["boxes"], "scores": np.asarray([0.9]),
            "labels": np.asarray([0]), "masks": m.copy()}
    ev.add_image(dets, gts)
    s = ev.summarize()
    np.testing.assert_allclose(s["segm_mAP"], 1.0, atol=1e-6)


def test_false_positives_lower_map():
    ev = DetectionEvaluator(num_classes=1)
    gts = {"boxes": np.asarray([[0, 0, 10, 10.0]]), "labels": np.asarray([0])}
    dets = {"boxes": np.asarray([[0, 0, 10, 10.0], [50, 50, 60, 60.0]]),
            "scores": np.asarray([0.8, 0.9]),  # FP scores HIGHER than the TP
            "labels": np.asarray([0, 0])}
    ev.add_image(dets, gts)
    s = ev.summarize()
    assert 0.4 < s["bbox_mAP50"] < 0.6  # precision at recall 1 is 1/2
