"""Detection primitives the reference gets from mmcv CUDA ops, re-derived for
XLA: anchors, delta decoding, fixed-size NMS, and RoIAlign.

All shapes are static: proposals/detections are fixed-capacity arrays with
validity masks (score > -inf convention), so everything jits once and runs as
pure device code — no dynamic host round-trips per image.
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# -------------------------------------------------------------------- anchors

def base_anchors(stride: int, scales=(8,), ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """mmdet AnchorGenerator base anchors (center offset 0)."""
    w = h = stride
    x_c, y_c = 0.0, 0.0
    out = []
    for r in ratios:
        h_r = np.sqrt(r)
        w_r = 1.0 / h_r
        for s in scales:
            ws = w * s * w_r
            hs = h * s * h_r
            out.append([x_c - 0.5 * ws, y_c - 0.5 * hs, x_c + 0.5 * ws, y_c + 0.5 * hs])
    return np.asarray(out, dtype=np.float32)


def grid_anchors(feat_h: int, feat_w: int, stride: int,
                 scales=(8,), ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """(feat_h*feat_w*A, 4) anchors for one level."""
    base = base_anchors(stride, scales, ratios)  # (A, 4)
    shift_x = np.arange(feat_w, dtype=np.float32) * stride
    shift_y = np.arange(feat_h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    all_anchors = (base[None, :, :] + shifts[:, None, :]).reshape(-1, 4)
    return all_anchors


# ---------------------------------------------------------------- bbox deltas

def delta2bbox(rois, deltas, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
               max_shape=None, wh_ratio_clip=16 / 1000):
    """mmdet DeltaXYWHBBoxCoder.decode."""
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = abs(float(np.log(wh_ratio_clip)))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        h, w = max_shape
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)], axis=-1)
    return boxes


# ----------------------------------------------------------------------- NMS

def box_iou(boxes1, boxes2):
    """(M, 4) x (N, 4) -> (M, N) IoU."""
    area1 = jnp.maximum(boxes1[:, 2] - boxes1[:, 0], 0) * \
        jnp.maximum(boxes1[:, 3] - boxes1[:, 1], 0)
    area2 = jnp.maximum(boxes2[:, 2] - boxes2[:, 0], 0) * \
        jnp.maximum(boxes2[:, 3] - boxes2[:, 1], 0)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(boxes, scores, iou_threshold: float, max_out: int):
    """Greedy NMS with static shapes.

    Returns (keep_idx (max_out,), keep_valid (max_out,)) — the indices of the
    survivors in score order. O(max_out * N) via iterative masking (the XLA
    replacement for mmcv's CUDA nms).
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(state, _):
        alive, = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        best_valid = masked[best] > -jnp.inf
        suppress = iou[best] > iou_threshold
        alive = alive & (~suppress) & (jnp.arange(n) != best)
        return (alive,), (best, best_valid)

    (_,), (keep_idx, keep_valid) = jax.lax.scan(
        body, (jnp.ones((n,), bool),), None, length=max_out)
    return keep_idx, keep_valid


def batched_nms_fixed(boxes, scores, ids, iou_threshold: float, max_out: int):
    """Class/level-aware NMS: offset boxes per id so cross-id pairs never
    suppress (the mmcv batched_nms trick)."""
    max_coord = jnp.max(boxes) + 1.0
    offsets = ids.astype(jnp.float32)[:, None] * max_coord
    return nms_fixed(boxes + offsets, scores, iou_threshold, max_out)


# ------------------------------------------------------------------ RoIAlign

def roi_align(feat_nhwc, rois, output_size: int, spatial_scale: float,
              sampling_ratio: int = 0):
    """mmcv/torchvision RoIAlign (aligned=True) on one NHWC feature map.

    rois: (R, 4) in image coordinates (x1, y1, x2, y2). Returns
    (R, output_size, output_size, C). Implemented as a gather of bilinear
    taps — XLA vectorizes the (R, P, P, S, S) sampling lattice.

    sampling_ratio semantics: >0 uses that many taps per bin axis (exact
    mmcv). 0 is mmcv's *adaptive* mode, ceil(bin_size) taps per bin — a
    data-dependent shape XLA cannot compile, so we approximate it with a
    STATIC 2-tap lattice. 2 matches ceil(bin_size) exactly for bins in
    (1, 2]px (rois in (output_size, 2*output_size]px on this feature level,
    which covers mmdet's FPN-level-assigned rois); sub-1px bins are
    over-sampled (2 taps where mmcv uses 1 — a denser estimate of the same
    bin average) and larger bins are undersampled relative to mmcv,
    averaging 4 instead of ceil(bin)^2 taps per bin. Callers
    cropping large rois against fine maps (e.g. mask targets from full-res
    GT bitmaps) should pass an explicit sampling_ratio sized to their roi
    distribution instead of relying on 0.
    """
    n, h, w, c = feat_nhwc.shape
    assert n == 1, "roi_align expects a single image feature map"
    feat = feat_nhwc[0]
    r = rois.shape[0]
    p = output_size

    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)
    bin_w = roi_w / p
    bin_h = roi_h / p

    s = sampling_ratio if sampling_ratio > 0 else 2  # static stand-in for mmcv's adaptive ceil(bin) — see docstring
    # sample grid: (R, P, S) positions per axis, position = origin + (bin + frac) * bin_size
    bins = jnp.arange(p, dtype=jnp.float32)
    frac = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    grid = bins[None, :, None] + frac[None, None, :]            # (1, P, S)
    ys = y1[:, None, None] + grid * bin_h[:, None, None]
    xs = x1[:, None, None] + grid * bin_w[:, None, None]

    def bilinear(yy, xx):
        # mmcv: samples in (-1, 0] snap to 0 (bilinear_interpolate's
        # `if (y <= 0) y = 0`), outside [-1, size] contribute zero
        inside = (yy >= -1.0) & (yy <= h) & (xx >= -1.0) & (xx <= w)
        yy = jnp.maximum(yy, 0.0)
        xx = jnp.maximum(xx, 0.0)
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy1 = yy - y0
        wx1 = xx - x0
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        v00 = feat[y0i, x0i]
        v01 = feat[y0i, x1i]
        v10 = feat[y1i, x0i]
        v11 = feat[y1i, x1i]
        val = (v00 * ((1 - wy1) * (1 - wx1))[..., None]
               + v01 * ((1 - wy1) * wx1)[..., None]
               + v10 * (wy1 * (1 - wx1))[..., None]
               + v11 * (wy1 * wx1)[..., None])
        return jnp.where(inside[..., None], val, 0.0)

    # full lattice: (R, P, S) x and y -> (R, P, S, P, S)
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy = jnp.broadcast_to(yy, (r, p, s, p, s))
    xx = jnp.broadcast_to(xx, (r, p, s, p, s))
    vals = bilinear(yy, xx)                       # (R, P, S, P, S, C)
    return vals.mean(axis=(2, 4))                 # (R, P, P, C)


def map_rois_to_fpn_levels(rois, num_levels: int = 4, finest_scale: int = 56):
    """mmdet SingleRoIExtractor.map_roi_levels: level = floor(log2(sqrt(area)
    / finest_scale + 1e-6)), clamped to [0, num_levels)."""
    scale = jnp.sqrt(jnp.maximum(rois[:, 2] - rois[:, 0], 0) *
                     jnp.maximum(rois[:, 3] - rois[:, 1], 0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def extract_roi_features(fpn_feats, rois, output_size: int,
                         strides=(4, 8, 16, 32)):
    """RoIAlign each roi from its mapped FPN level; fixed shapes via computing
    all levels and selecting (4x compute, zero dynamism — the XLA trade)."""
    lvl = map_rois_to_fpn_levels(rois, num_levels=len(strides))
    per_level = [roi_align(fpn_feats[i], rois, output_size, 1.0 / strides[i])
                 for i in range(len(strides))]
    stacked = jnp.stack(per_level, axis=0)        # (L, R, P, P, C)
    return jnp.take_along_axis(
        stacked, lvl[None, :, None, None, None], axis=0)[0]
