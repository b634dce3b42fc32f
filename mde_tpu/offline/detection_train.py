"""Detector training machinery — assigners, samplers, target coders, losses —
for the Swin Cascade Mask R-CNN (the reference retrains it on ADE20K:
Swin…/configs/swin/cascade_…ade20k.py, mmdet/core/bbox/{assigners,samplers},
mmdet GIoU/SmoothL1/CE losses).

Everything is fixed-shape XLA: assignment is a dense IoU argmax, sampling is
top-k over keyed random scores with validity masks (no host round trips), so
the whole multi-stage train step jits once.

Train config constants follow the reference exactly:
  RPN: MaxIoUAssigner(pos .7 / neg .3 / min_pos .3, match_low_quality),
       RandomSampler(256, pos_fraction .5), SmoothL1(beta 1/9)
  RCNN stages: pos/neg thresholds .5/.6/.7, RandomSampler(512, pos .25,
       add_gt_as_proposals), class-specific deltas w/ per-stage stds,
       CE cls + GIoU(weight 10) on decoded boxes (reg_decoded_bbox=True),
       mask BCE at 28x28; stage loss weights 1/.5/.25.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .detection_ops import box_iou

STAGE_POS_THR = (0.5, 0.6, 0.7)
STAGE_LOSS_WEIGHTS = (1.0, 0.5, 0.25)


# ------------------------------------------------------------------- coders

def bbox2delta(proposals, gt, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.)):
    """mmdet DeltaXYWHBBoxCoder.encode."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], 1e-6)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], 1e-6)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
    deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                        jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
    return (deltas - jnp.asarray(means)) / jnp.asarray(stds)


# ------------------------------------------------------------------- losses

def smooth_l1_loss(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def giou(boxes1, boxes2):
    """Elementwise GIoU between aligned box arrays (..., 4)."""
    area1 = jnp.maximum(boxes1[..., 2] - boxes1[..., 0], 0) * \
        jnp.maximum(boxes1[..., 3] - boxes1[..., 1], 0)
    area2 = jnp.maximum(boxes2[..., 2] - boxes2[..., 0], 0) * \
        jnp.maximum(boxes2[..., 3] - boxes2[..., 1], 0)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = jnp.maximum(area1 + area2 - inter, 1e-7)
    iou = inter / union
    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.maximum(rb_c - lt_c, 0)
    enclose = jnp.maximum(wh_c[..., 0] * wh_c[..., 1], 1e-7)
    return iou - (enclose - union) / enclose


def giou_loss(pred_boxes, target_boxes):
    return 1.0 - giou(pred_boxes, target_boxes)


def softmax_ce_loss(logits, labels):
    """Per-sample cross entropy with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def bce_with_logits(logits, targets):
    """Stable elementwise BCE with logits."""
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


# -------------------------------------------------------------- assignment

class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray    # (N,) -1 = neg, -2 = ignore/invalid, >=0 = gt index
    max_ious: jnp.ndarray   # (N,)
    labels: jnp.ndarray     # (N,) assigned gt class (0 where not positive)


def max_iou_assign(boxes, gt_boxes, gt_labels, gt_valid,
                   pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float, match_low_quality: bool) -> AssignResult:
    """mmdet MaxIoUAssigner with static shapes. gt_valid masks padded gts."""
    n = boxes.shape[0]
    iou = box_iou(boxes, gt_boxes)                            # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    argmax = jnp.argmax(iou, axis=1)

    gt_inds = jnp.full((n,), -2, jnp.int32)
    gt_inds = jnp.where(max_iou >= 0, -1, gt_inds)            # negatives first
    gt_inds = jnp.where(max_iou >= pos_iou_thr, argmax, gt_inds)
    # anything in [neg_thr, pos_thr) stays ignore (-2) per mmdet semantics
    between = (max_iou >= neg_iou_thr) & (max_iou < pos_iou_thr)
    gt_inds = jnp.where(between, -2, gt_inds)

    if match_low_quality:
        # each gt claims its best-overlapping box if that overlap >= min_pos_iou
        gt_max = jnp.max(iou, axis=0)                          # (G,)
        # box i is gt g's argmax and iou equals the gt max (handles ties)
        is_best = (iou == gt_max[None, :]) & (iou >= min_pos_iou) & gt_valid[None, :]
        claimed = jnp.argmax(is_best, axis=1)
        any_claim = jnp.any(is_best, axis=1)
        gt_inds = jnp.where(any_claim, claimed, gt_inds)

    labels = jnp.where(gt_inds >= 0,
                       jnp.take(gt_labels, jnp.maximum(gt_inds, 0)), 0)
    return AssignResult(gt_inds, max_iou, labels)


def random_sample(rng, assign: AssignResult, num: int, pos_fraction: float):
    """mmdet RandomSampler with static output size `num`.

    Returns (indices (num,), is_pos (num,), valid (num,)): positives first
    (up to num*pos_fraction), negatives fill the rest; selection is by
    keyed-random top-k so it jits.
    """
    n = assign.gt_inds.shape[0]
    num_pos_max = int(num * pos_fraction)
    pos_mask = assign.gt_inds >= 0
    neg_mask = assign.gt_inds == -1

    r1, r2 = jax.random.split(rng)
    pos_scores = jnp.where(pos_mask, jax.random.uniform(r1, (n,)), -1.0)
    neg_scores = jnp.where(neg_mask, jax.random.uniform(r2, (n,)), -1.0)

    pos_top, pos_idx = jax.lax.top_k(pos_scores, min(num_pos_max, n))
    pos_valid = pos_top > 0
    n_pos = jnp.sum(pos_valid)

    neg_top, neg_idx = jax.lax.top_k(neg_scores, min(num, n))
    # take enough negatives to fill `num`
    want_neg = num - n_pos
    neg_rank = jnp.arange(neg_idx.shape[0])
    neg_valid = (neg_top > 0) & (neg_rank < want_neg)

    idx = jnp.concatenate([pos_idx, neg_idx])[:num + num_pos_max]
    is_pos = jnp.concatenate([pos_valid, jnp.zeros_like(neg_valid)])[:num + num_pos_max]
    valid = jnp.concatenate([pos_valid, neg_valid])[:num + num_pos_max]

    # compact to exactly `num` slots: order by (valid desc, pos desc)
    order = jnp.argsort(~valid)  # valid first (stable)
    take = order[:num]
    return idx[take], is_pos[take], valid[take]


# -------------------------------------------------------------- rpn targets

def rpn_loss(anchors, cls_logits_flat, deltas_flat, gt_boxes, gt_labels,
             gt_valid, rng, img_hw, num_samples: int = 256):
    """RPN objectness + box loss for one image (reference train_cfg.rpn)."""
    assign = max_iou_assign(anchors, gt_boxes, jnp.zeros_like(gt_labels),
                            gt_valid, pos_iou_thr=0.7, neg_iou_thr=0.3,
                            min_pos_iou=0.3, match_low_quality=True)
    # allowed_border=0: anchors outside the image are ignored
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0) &
              (anchors[:, 2] <= img_hw[1]) & (anchors[:, 3] <= img_hw[0]))
    assign = assign._replace(gt_inds=jnp.where(inside, assign.gt_inds, -2))

    idx, is_pos, valid = random_sample(rng, assign, num_samples, 0.5)
    sel_logits = jnp.take(cls_logits_flat, idx)
    cls_targets = is_pos.astype(jnp.float32)
    cls_loss = bce_with_logits(sel_logits, cls_targets)
    cls_loss = jnp.sum(jnp.where(valid, cls_loss, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)

    gt_idx = jnp.maximum(jnp.take(assign.gt_inds, idx), 0)
    matched_gt = jnp.take(gt_boxes, gt_idx, axis=0)
    sel_anchors = jnp.take(anchors, idx, axis=0)
    delta_targets = bbox2delta(sel_anchors, matched_gt)
    sel_deltas = jnp.take(deltas_flat, idx, axis=0)
    reg = smooth_l1_loss(sel_deltas, delta_targets, beta=1.0 / 9.0).sum(-1)
    reg_loss = jnp.sum(jnp.where(valid & is_pos, reg, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
    return cls_loss, reg_loss


# ------------------------------------------------------------- rcnn targets

def rcnn_stage_targets(rng, proposals, gt_boxes, gt_labels, gt_valid,
                       pos_thr: float, num_classes: int,
                       num_samples: int = 512, add_gt: bool = True):
    """Sample rois + build per-stage cls/box targets.

    Returns dict(rois, labels (num,), is_pos, valid, matched_gt_boxes).
    Background label = num_classes (mmdet convention: cls head has C+1 with
    background last)."""
    if add_gt:
        proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
    assign = max_iou_assign(proposals, gt_boxes, gt_labels, gt_valid,
                            pos_iou_thr=pos_thr, neg_iou_thr=pos_thr,
                            min_pos_iou=pos_thr, match_low_quality=False)
    idx, is_pos, valid = random_sample(rng, assign, num_samples, 0.25)
    rois = jnp.take(proposals, idx, axis=0)
    labels = jnp.where(is_pos, jnp.take(assign.labels, idx), num_classes)
    gt_idx = jnp.maximum(jnp.take(assign.gt_inds, idx), 0)
    matched = jnp.take(gt_boxes, gt_idx, axis=0)
    return dict(rois=rois, labels=labels, is_pos=is_pos, valid=valid,
                matched_gt=matched, gt_idx=gt_idx)


def rcnn_stage_loss(cls_logits, decoded_boxes, targets, num_classes: int,
                    giou_weight: float = 10.0):
    """CE classification + GIoU regression on decoded boxes
    (reg_decoded_bbox=True in the ade20k config)."""
    valid = targets["valid"]
    is_pos = targets["is_pos"] & valid
    cls = softmax_ce_loss(cls_logits, targets["labels"])
    cls_loss = jnp.sum(jnp.where(valid, cls, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    reg = giou_loss(decoded_boxes, targets["matched_gt"])
    reg_loss = giou_weight * jnp.sum(jnp.where(is_pos, reg, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
    return cls_loss, reg_loss


def mask_targets(gt_masks_full, targets, mask_size: int = 28,
                 sampling_ratio: int = 4):
    """Crop each roi's matched GT mask to 28x28 mask-head targets.

    mmdet builds these with bilinear roi_align on the GT bitmap followed by
    a >=0.5 binarize (BitmapMasks.crop_and_resize via mask_target_single),
    NOT nearest sampling — bilinear+threshold shifts boundary pixels by up to
    half a cell vs nearest, which matters for mask-head training fidelity.

    mmcv's sampling_ratio=0 here means ceil(roi/28) adaptive taps per bin —
    data-dependent, so not XLA-compilable. We use a static 4-tap lattice: it
    matches mmcv's count exactly for rois in (84, 112]px, over-samples the
    bin integral below that (a closer estimate of the true average, not
    bit-identical to mmcv's coarser lattice), and under-samples above it
    (boundary cells may flip after the 0.5 binarize); raise sampling_ratio
    if training images put most instances above ~112px.

    gt_masks_full: (G, H, W) float; returns (num, 28, 28) {0,1} targets
    aligned with the sampled rois."""
    from .detection_ops import roi_align

    rois = targets["rois"]
    masks = jnp.take(gt_masks_full.astype(jnp.float32), targets["gt_idx"], axis=0)

    def one(mask, roi):
        out = roi_align(mask[None, :, :, None], roi[None], mask_size, 1.0,
                        sampling_ratio=sampling_ratio)
        return out[0, :, :, 0]

    vals = jax.vmap(one)(masks, rois)
    return (vals >= 0.5).astype(jnp.float32)


def mask_loss(mask_logits, targets, mask_tgts):
    """BCE on the positive rois' own-class mask maps
    (mmdet FCNMaskHead.loss)."""
    labels = jnp.minimum(targets["labels"], mask_logits.shape[-1] - 1)
    own = jnp.take_along_axis(mask_logits, labels[:, None, None, None],
                              axis=-1)[..., 0]
    per_roi = bce_with_logits(own, mask_tgts).mean(axis=(1, 2))
    is_pos = targets["is_pos"] & targets["valid"]
    return jnp.sum(jnp.where(is_pos, per_roi, 0.0)) / jnp.maximum(
        jnp.sum(is_pos), 1)
