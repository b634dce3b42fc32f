"""Cascade Mask R-CNN inference assembly (flax heads + XLA detection ops).

Re-derivation of the mmdet CascadeRCNN.simple_test path the reference drives
through tools/nyud2_inference.py (Swin…/mmdet/models/detectors/two_stage.py:187,
roi_heads/cascade_roi_head.py simple_test), specialized to the single ade20k
config (configs/swin/cascade_…ade20k.py):

  Swin-B -> FPN(5) -> RPN (3 anchors/loc, top-1000, NMS .7)
  -> 3 cascade ConvFC bbox heads (4 convs + 1 fc, class-specific regression,
     per-stage target stds, cls scores averaged across stages)
  -> class-aware NMS (score .05, iou .5, top 100)
  -> FCN mask head (4 convs + deconv, 28x28 per-class masks, thr .5)

Everything is fixed-capacity (1000 proposals, 100 detections) so a whole
image runs as one jitted device program; masks are pasted at full image
resolution on device via the framework's resize ops.
"""

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .detection_ops import (batched_nms_fixed, delta2bbox, extract_roi_features,
                            grid_anchors, nms_fixed)
from .fpn import FPN
from .swin import SwinTransformer

STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
FPN_STRIDES = (4, 8, 16, 32, 64)
NUM_PROPOSALS = 1000
MAX_DETS = 100


class RPNHead(nn.Module):
    """3x3 conv + objectness/delta 1x1 heads, shared across levels."""
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        outs = []
        conv = nn.Conv(256, (3, 3), padding=1, name="rpn_conv", dtype=self.dtype)
        cls = nn.Conv(self.num_anchors, (1, 1), name="rpn_cls", dtype=self.dtype)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="rpn_reg", dtype=self.dtype)
        for f in feats:
            y = nn.relu(conv(f))
            outs.append((cls(y), reg(y)))
        return outs


class ConvFCBBoxHead(nn.Module):
    """4 shared convs (+BN) + 1 shared fc -> cls (C+1) + reg (4C)
    (the ade20k config's ConvFCBBoxHead, configs/swin/cascade_…ade20k.py:22-44)."""
    num_classes: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        y = roi_feats
        for i in range(4):
            y = nn.Conv(256, (3, 3), padding=1, use_bias=False,
                        name=f"shared_conv{i}", dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name=f"shared_bn{i}",
                             dtype=jnp.float32)(y)
            y = nn.relu(y.astype(self.dtype))
        y = y.reshape(y.shape[0], -1)
        y = nn.relu(nn.Dense(1024, name="shared_fc", dtype=self.dtype)(y))
        cls_score = nn.Dense(self.num_classes + 1, name="fc_cls",
                             dtype=self.dtype)(y)
        bbox_pred = nn.Dense(self.num_classes * 4, name="fc_reg",
                             dtype=self.dtype)(y)
        return cls_score.astype(jnp.float32), bbox_pred.astype(jnp.float32)


class FCNMaskHead(nn.Module):
    num_classes: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        y = roi_feats
        for i in range(4):
            y = nn.relu(nn.Conv(256, (3, 3), padding=1, name=f"conv{i}",
                                dtype=self.dtype)(y))
        y = nn.ConvTranspose(256, (2, 2), strides=(2, 2), name="upsample",
                             dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_classes, (1, 1), name="conv_logits", dtype=self.dtype)(y)
        return y.astype(jnp.float32)        # (R, 28, 28, C)


class CascadeMaskRCNN(nn.Module):
    """Full detector; __call__ returns raw head outputs, `infer` assembles
    detections + masks for one image."""
    num_classes: int = 100
    use_checkpoint: bool = False   # remat Swin blocks (training memory)
    dtype: Any = jnp.float32
    # test_cfg.rcnn score threshold (mmdet default 0.05). Exposed so
    # random-init system runs can lower it: an untrained head's softmax
    # sits near 1/(C+1) and 0.05 rejects everything.
    score_thr: float = 0.05

    def setup(self):
        self.backbone = SwinTransformer(dtype=self.dtype, name="backbone",
                                        use_checkpoint=self.use_checkpoint)
        self.neck = FPN(dtype=self.dtype, name="neck")
        self.rpn_head = RPNHead(dtype=self.dtype, name="rpn_head")
        self.bbox_heads = [ConvFCBBoxHead(self.num_classes, self.dtype,
                                          name=f"bbox_head{i}") for i in range(3)]
        # CascadeRoIHead replicates the mask head per stage and averages the
        # sigmoid outputs at test (cascade_roi_head.py:380-398).
        self.mask_heads = [FCNMaskHead(self.num_classes, self.dtype,
                                       name=f"mask_head{i}") for i in range(3)]

    def __call__(self, image_nhwc):
        """Forward for init: runs every submodule once on tiny shapes."""
        feats = self.neck(self.backbone(image_nhwc))
        rpn_outs = self.rpn_head(feats)
        dummy_rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
        roi_feats7 = extract_roi_features(feats[:4], dummy_rois, 7)
        outs = [head(roi_feats7) for head in self.bbox_heads]
        roi_feats14 = extract_roi_features(feats[:4], dummy_rois, 14)
        masks = [head(roi_feats14) for head in self.mask_heads]
        return rpn_outs, outs, masks

    # ------------------------------------------------------------- inference
    def infer(self, image_nhwc, img_hw):
        """Detect on one padded image. img_hw = valid (unpadded) extent for
        clipping. Returns dict with fixed-size arrays:
          boxes (100, 4), scores (100,), labels (100,), valid (100,),
          masks28 (100, 28, 28) sigmoid probabilities for the chosen class.
        """
        feats = self.neck(self.backbone(image_nhwc))
        rpn_outs = self.rpn_head(feats)
        proposals, prop_valid = self._rpn_proposals(rpn_outs, feats, img_hw)

        # cascade refinement: average cls over stages, refine rois each stage
        rois = proposals
        cls_sum = None
        for i, head in enumerate(self.bbox_heads):
            roi_feats = extract_roi_features(feats[:4], rois, 7)
            cls_score, bbox_pred = head(roi_feats)
            probs = jax.nn.softmax(cls_score, axis=-1)
            cls_sum = probs if cls_sum is None else cls_sum + probs
            # refine with the argmax-class delta (mmdet regress_by_class)
            best = jnp.argmax(cls_score[:, :-1], axis=-1)
            deltas = bbox_pred.reshape(-1, self.num_classes, 4)
            sel = jnp.take_along_axis(deltas, best[:, None, None].repeat(4, -1),
                                      axis=1)[:, 0]
            rois = delta2bbox(rois, sel, stds=STAGE_STDS[i], max_shape=img_hw)
        cls_avg = cls_sum / 3.0                                    # (R, C+1)

        boxes, scores, labels, valid = self._multiclass_nms(
            rois, cls_avg, prop_valid, score_thr=self.score_thr)
        # mask heads on final boxes; per-stage sigmoid average
        roi_feats = extract_roi_features(feats[:4], boxes, 14)
        mask_prob = None
        for head in self.mask_heads:
            p = jax.nn.sigmoid(head(roi_feats))                    # (D, 28, 28, C)
            mask_prob = p if mask_prob is None else mask_prob + p
        mask_prob = mask_prob / 3.0
        masks = jnp.take_along_axis(
            mask_prob, labels[:, None, None, None], axis=-1)[..., 0]
        return {"boxes": boxes, "scores": scores, "labels": labels,
                "valid": valid, "masks28": masks}

    # -------------------------------------------------------------- training
    def compute_losses(self, image_nhwc, gt_boxes, gt_labels, gt_valid,
                       gt_masks, rng, img_hw, num_samples: int = 512):
        """Single-image multi-stage training losses (mmdet CascadeRoIHead
        forward_train semantics; reference train_cfg in
        configs/_base_/models/cascade_…ade20k.py:120-196).

        gt_boxes (G,4) / gt_labels (G,) / gt_valid (G,) padded to a static G;
        gt_masks (G, H, W) float. Returns a dict of scalar losses.
        """
        from .detection_train import (STAGE_LOSS_WEIGHTS, STAGE_POS_THR,
                                      mask_loss, mask_targets, rcnn_stage_loss,
                                      rcnn_stage_targets, rpn_loss)
        from .detection_ops import grid_anchors as _grid_anchors

        feats = self.neck(self.backbone(image_nhwc))
        rpn_outs = self.rpn_head(feats)

        # RPN losses over all levels' anchors
        anchors = jnp.concatenate([
            jnp.asarray(_grid_anchors(f.shape[1], f.shape[2], FPN_STRIDES[i]))
            for i, f in enumerate(feats)])
        cls_flat = jnp.concatenate([c.reshape(-1) for c, _ in rpn_outs]).astype(jnp.float32)
        reg_flat = jnp.concatenate([r.reshape(-1, 4) for _, r in rpn_outs]).astype(jnp.float32)
        rng, r_rpn = jax.random.split(rng)
        rpn_cls_l, rpn_reg_l = rpn_loss(anchors, cls_flat, reg_flat, gt_boxes,
                                        gt_labels, gt_valid, r_rpn, img_hw)

        proposals, _ = self._rpn_proposals(rpn_outs, feats, img_hw)
        proposals = jax.lax.stop_gradient(proposals)

        losses = {"rpn_cls": rpn_cls_l, "rpn_reg": rpn_reg_l}
        rois = proposals
        for i, head in enumerate(self.bbox_heads):
            rng, r_s = jax.random.split(rng)
            tgt = rcnn_stage_targets(r_s, rois, gt_boxes, gt_labels, gt_valid,
                                     pos_thr=STAGE_POS_THR[i],
                                     num_classes=self.num_classes,
                                     num_samples=num_samples, add_gt=True)
            roi_feats = extract_roi_features(feats[:4], tgt["rois"], 7)
            cls_score, bbox_pred = head(roi_feats, train=True)
            # class-specific delta of the TARGET class, decoded for GIoU
            deltas = bbox_pred.reshape(-1, self.num_classes, 4)
            lbl = jnp.minimum(tgt["labels"], self.num_classes - 1)
            sel = jnp.take_along_axis(deltas, lbl[:, None, None].repeat(4, -1),
                                      axis=1)[:, 0]
            decoded = delta2bbox(tgt["rois"], sel, stds=STAGE_STDS[i],
                                 max_shape=img_hw)
            cls_l, reg_l = rcnn_stage_loss(cls_score, decoded, tgt,
                                           self.num_classes)
            w = STAGE_LOSS_WEIGHTS[i]
            losses[f"s{i}_cls"] = w * cls_l
            losses[f"s{i}_reg"] = w * reg_l

            # stage mask loss on this stage's sampled rois
            mask_roi_feats = extract_roi_features(feats[:4], tgt["rois"], 14)
            m_logits = self.mask_heads[i](mask_roi_feats)
            m_tgts = mask_targets(gt_masks, tgt)
            losses[f"s{i}_mask"] = w * mask_loss(m_logits, tgt, m_tgts)

            # refine rois for the next stage with the predicted class's delta
            # (no gradient through the proposal chain)
            best = jnp.argmax(cls_score[:, :-1], axis=-1)
            sel_pred = jnp.take_along_axis(deltas, best[:, None, None].repeat(4, -1),
                                           axis=1)[:, 0]
            rois = jax.lax.stop_gradient(
                delta2bbox(tgt["rois"], sel_pred, stds=STAGE_STDS[i],
                           max_shape=img_hw))

        losses["total"] = sum(losses.values())
        return losses

    def _rpn_proposals(self, rpn_outs, feats, img_hw):
        """Top-1000 proposals via per-level topk + level-aware NMS
        (test_cfg.rpn: nms_pre 1000, iou .7, max 1000)."""
        all_boxes, all_scores, all_ids = [], [], []
        for lvl, ((cls, reg), f) in enumerate(zip(rpn_outs, feats)):
            fh, fw = f.shape[1:3]
            anchors = jnp.asarray(grid_anchors(fh, fw, FPN_STRIDES[lvl]))
            scores = jax.nn.sigmoid(cls.reshape(-1).astype(jnp.float32))
            deltas = reg.reshape(-1, 4).astype(jnp.float32)
            k = min(1000, scores.shape[0])
            top_s, top_i = jax.lax.top_k(scores, k)
            boxes = delta2bbox(jnp.take(anchors, top_i, axis=0),
                               jnp.take(deltas, top_i, axis=0),
                               max_shape=img_hw)
            all_boxes.append(boxes)
            all_scores.append(top_s)
            all_ids.append(jnp.full((k,), lvl, jnp.int32))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        ids = jnp.concatenate(all_ids)
        keep_idx, keep_valid = batched_nms_fixed(boxes, scores, ids, 0.7,
                                                 NUM_PROPOSALS)
        return jnp.take(boxes, keep_idx, axis=0), keep_valid

    def _multiclass_nms(self, rois, cls_avg, prop_valid,
                        score_thr: float = 0.05):
        """mmdet multiclass_nms with fixed output capacity
        (test_cfg.rcnn: score .05, iou .5, max 100)."""
        r = rois.shape[0]
        c = self.num_classes
        scores = cls_avg[:, :-1]                                  # drop background
        scores = jnp.where(prop_valid[:, None], scores, 0.0)
        flat_scores = scores.reshape(-1)                           # (R*C,)
        flat_labels = jnp.tile(jnp.arange(c), (r,))
        flat_boxes = jnp.repeat(rois, c, axis=0)
        flat_scores = jnp.where(flat_scores > score_thr, flat_scores, 0.0)

        # prefilter to a workable candidate count
        k = min(NUM_PROPOSALS, flat_scores.shape[0])
        top_s, top_i = jax.lax.top_k(flat_scores, k)
        cand_boxes = jnp.take(flat_boxes, top_i, axis=0)
        cand_labels = jnp.take(flat_labels, top_i, axis=0)
        keep_idx, keep_valid = batched_nms_fixed(cand_boxes, top_s, cand_labels,
                                                 0.5, MAX_DETS)
        boxes = jnp.take(cand_boxes, keep_idx, axis=0)
        scores_out = jnp.take(top_s, keep_idx, axis=0)
        labels = jnp.take(cand_labels, keep_idx, axis=0)
        valid = keep_valid & (scores_out > score_thr)
        return boxes, scores_out, labels, valid


def paste_masks(det: dict, img_h: int, img_w: int, thr: float = 0.5) -> np.ndarray:
    """Host-side mask pasting: resize each 28x28 mask into its box and
    threshold (mmdet FCNMaskHead.get_seg_masks semantics). Returns
    (D, img_h, img_w) boolean stack aligned with det['valid']."""
    from ..ops.resize import _linear_weights_half_pixel  # reuse weight builder

    boxes = np.asarray(det["boxes"])
    masks28 = np.asarray(det["masks28"])
    valid = np.asarray(det["valid"])
    out = np.zeros((boxes.shape[0], img_h, img_w), dtype=bool)
    for i in range(boxes.shape[0]):
        if not valid[i]:
            continue
        x1, y1, x2, y2 = boxes[i]
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
        w = max(x2i - x1i, 1)
        h = max(y2i - y1i, 1)
        wh_ = _linear_weights_half_pixel(28, h)
        ww_ = _linear_weights_half_pixel(28, w)
        m = wh_ @ masks28[i] @ ww_.T
        ys, ye = max(y1i, 0), min(y2i, img_h)
        xs, xe = max(x1i, 0), min(x2i, img_w)
        if ys >= ye or xs >= xe:
            continue
        out[i, ys:ye, xs:xe] = m[ys - y1i:ye - y1i, xs - x1i:xe - x1i] > thr
    return out


def collapse_detections(det: dict, masks_full: np.ndarray, img_h: int,
                        img_w: int, use_bbox_area: bool = False):
    """tools/nyud2_inference.py:104-124 collapse: iterate detections in
    ascending class order (the reference loops class 0..99, instances in
    score order within class) painting label/area maps; later classes
    overwrite earlier ones."""
    labels = np.asarray(det["labels"])
    boxes = np.asarray(det["boxes"])
    valid = np.asarray(det["valid"])
    collapsed_labels = np.full((img_h, img_w), -1, dtype=np.int32)
    collapsed_areas = np.zeros((img_h, img_w), dtype=np.int32)
    order = np.argsort(labels, kind="stable")
    for i in order:
        if not valid[i]:
            continue
        m = masks_full[i]
        if use_bbox_area:
            x1, y1, x2, y2 = boxes[i]
            area = int((x2 - x1) * (y2 - y1))
        else:
            area = int(m.sum())
        collapsed_labels[m] = int(labels[i])
        collapsed_areas[m] = area
    return collapsed_labels, collapsed_areas
