"""Depth-eval metrics (reference utils.py:119-139), plus a masked on-device
variant so the eval hot loop never leaves the TPU.

Every metric is a mean over valid pixels, so the dense masked form (weighted
means over the full map) is arithmetically identical to the reference's
boolean-gathered form while keeping shapes static for XLA.
"""

import jax.numpy as jnp
import numpy as np

METRIC_NAMES = ("a1", "a2", "a3", "abs_rel", "rmse", "log_10", "rmse_log", "silog", "sq_rel")


def compute_errors(gt: np.ndarray, pred: np.ndarray) -> dict:
    """Host/numpy metrics on pre-gathered valid pixels (1-D arrays)."""
    thresh = np.maximum((gt / pred), (pred / gt))
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()

    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean(((gt - pred) ** 2) / gt)

    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())

    err = np.log(pred) - np.log(gt)
    silog = np.sqrt(np.mean(err ** 2) - np.mean(err) ** 2) * 100

    log_10 = (np.abs(np.log10(gt) - np.log10(pred))).mean()
    return dict(a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, rmse=rmse, log_10=log_10,
                rmse_log=rmse_log, silog=silog, sq_rel=sq_rel)


def compute_errors_masked(gt: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray) -> dict:
    """Device metrics over a dense map + validity mask. Same arithmetic as
    compute_errors restricted to mask==True pixels. Inputs are any matching
    shape; mask is boolean."""
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)

    def mmean(x):
        return jnp.sum(jnp.where(mask, x, 0.0)) / n

    safe_gt = jnp.where(mask, gt, 1.0)
    safe_pred = jnp.where(mask, pred, 1.0)

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = mmean((thresh < 1.25).astype(jnp.float32))
    a2 = mmean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = mmean((thresh < 1.25 ** 3).astype(jnp.float32))

    abs_rel = mmean(jnp.abs(safe_gt - safe_pred) / safe_gt)
    sq_rel = mmean((safe_gt - safe_pred) ** 2 / safe_gt)
    rmse = jnp.sqrt(mmean((safe_gt - safe_pred) ** 2))

    lg, lp = jnp.log(safe_gt), jnp.log(safe_pred)
    rmse_log = jnp.sqrt(mmean((lg - lp) ** 2))
    err = lp - lg
    silog = jnp.sqrt(jnp.maximum(mmean(err ** 2) - mmean(err) ** 2, 0.0)) * 100.0
    log_10 = mmean(jnp.abs(jnp.log10(safe_gt) - jnp.log10(safe_pred)))

    return dict(a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, rmse=rmse, log_10=log_10,
                rmse_log=rmse_log, silog=silog, sq_rel=sq_rel)


def intersection_and_union(pred: np.ndarray, label: np.ndarray,
                           num_classes: int, ignore_index: int = -1):
    """Segmentation mIoU accumulators (capability of the reference's
    mit_semseg/utils.py intersectionAndUnion): returns per-class
    (intersection, union) histograms; mIoU = (inter / union).mean() over
    classes with union > 0."""
    pred = np.asarray(pred).reshape(-1)
    label = np.asarray(label).reshape(-1)
    valid = label != ignore_index
    pred = pred[valid]
    label = label[valid]
    inter = pred[pred == label]
    area_inter, _ = np.histogram(inter, bins=num_classes, range=(0, num_classes))
    area_pred, _ = np.histogram(pred, bins=num_classes, range=(0, num_classes))
    area_label, _ = np.histogram(label, bins=num_classes, range=(0, num_classes))
    return area_inter, area_pred + area_label - area_inter


def eval_mask(gt_hw_shape, dataset: str = "nyu", garg_crop: bool = False,
              eigen_crop: bool = True) -> np.ndarray:
    """Static eval crop mask (reference evaluate.py:136-150)."""
    gt_height, gt_width = gt_hw_shape
    mask = np.zeros((gt_height, gt_width), dtype=bool)
    if garg_crop:
        mask[int(0.40810811 * gt_height):int(0.99189189 * gt_height),
             int(0.03594771 * gt_width):int(0.96405229 * gt_width)] = True
    elif eigen_crop:
        if dataset == 'kitti':
            mask[int(0.3324324 * gt_height):int(0.91351351 * gt_height),
                 int(0.0359477 * gt_width):int(0.96405229 * gt_width)] = True
        else:
            mask[45:471, 41:601] = True
    else:
        mask[:] = True
    return mask
