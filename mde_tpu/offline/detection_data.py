"""Detector training data pipeline — the DETR-style AutoAugment policy +
normalization/padding from the reference's ade20k config
(configs/swin/cascade_…ade20k.py:85-122) plus the AdamW paramwise recipe
(lr 1e-4, wd 0.05, no decay on norms / relative-position tables; step decay
at epochs 27/33 of 36).

Host-side numpy transforms over (image u8 HWC, boxes (G,4), labels (G,),
masks (G,H,W) u8); static-capacity outputs padded to MAX_GT.
"""

from typing import Optional

import numpy as np

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)
SCALES_MAIN = [(480, 1333), (512, 1333), (544, 1333), (576, 1333), (608, 1333),
               (640, 1333), (672, 1333), (704, 1333), (736, 1333), (768, 1333),
               (800, 1333)]
SCALES_PRE_CROP = [(400, 1333), (500, 1333), (600, 1333)]
CROP_RANGE = (384, 600)
MAX_GT = 100


def _resize_keep_ratio(img, boxes, masks, short, long_max):
    from PIL import Image
    h, w = img.shape[:2]
    scale = min(short / min(h, w), long_max / max(h, w))
    th, tw = int(h * scale + 0.5), int(w * scale + 0.5)
    img_r = np.asarray(Image.fromarray(img).resize((tw, th), Image.BILINEAR))
    boxes_r = boxes * scale
    masks_r = None
    if masks is not None and len(masks):
        masks_r = np.stack([np.asarray(
            Image.fromarray(m).resize((tw, th), Image.NEAREST)) for m in masks])
    return img_r, boxes_r, masks_r


def _random_crop(rng, img, boxes, labels, masks, crop_range):
    h, w = img.shape[:2]
    ch = int(rng.integers(crop_range[0], min(crop_range[1], h) + 1)) if h > crop_range[0] else h
    cw = int(rng.integers(crop_range[0], min(crop_range[1], w) + 1)) if w > crop_range[0] else w
    y0 = int(rng.integers(0, max(h - ch, 0) + 1))
    x0 = int(rng.integers(0, max(w - cw, 0) + 1))
    img_c = img[y0:y0 + ch, x0:x0 + cw]
    boxes_c = boxes - np.array([x0, y0, x0, y0], np.float32)
    boxes_c[:, 0::2] = boxes_c[:, 0::2].clip(0, cw)
    boxes_c[:, 1::2] = boxes_c[:, 1::2].clip(0, ch)
    keep = (boxes_c[:, 2] > boxes_c[:, 0]) & (boxes_c[:, 3] > boxes_c[:, 1])
    masks_c = masks[:, y0:y0 + ch, x0:x0 + cw] if masks is not None and len(masks) else masks
    return (img_c, boxes_c[keep], labels[keep],
            masks_c[keep] if masks_c is not None and len(masks_c) else masks_c)


def autoaugment_sample(rng: np.random.Generator, img_u8, boxes, labels, masks):
    """Apply flip + one of the two DETR-style policies; returns
    (normalized padded image f32, boxes, labels, masks, valid_hw)."""
    img, boxes, masks = np.asarray(img_u8), np.asarray(boxes, np.float32), masks

    # RandomFlip p=.5 (before AutoAugment in the pipeline)
    if rng.random() < 0.5:
        img = np.ascontiguousarray(img[:, ::-1])
        w = img.shape[1]
        boxes = boxes.copy()
        boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        if masks is not None and len(masks):
            masks = np.ascontiguousarray(masks[:, :, ::-1])

    if rng.random() < 0.5:
        short, lmax = SCALES_MAIN[int(rng.integers(len(SCALES_MAIN)))]
        img, boxes, masks = _resize_keep_ratio(img, boxes, masks, short, lmax)
    else:
        short, lmax = SCALES_PRE_CROP[int(rng.integers(len(SCALES_PRE_CROP)))]
        img, boxes, masks = _resize_keep_ratio(img, boxes, masks, short, lmax)
        img, boxes, labels, masks = _random_crop(rng, img, boxes, labels, masks,
                                                 CROP_RANGE)
        short, lmax = SCALES_MAIN[int(rng.integers(len(SCALES_MAIN)))]
        img, boxes, masks = _resize_keep_ratio(img, boxes, masks, short, lmax)

    x = (img.astype(np.float32) - MEAN) / STD
    h, w = x.shape[:2]
    ph, pw = ((h + 31) // 32) * 32, ((w + 31) // 32) * 32
    pad = np.zeros((ph, pw, 3), np.float32)
    pad[:h, :w] = x
    return pad, boxes, labels, masks, (h, w)


def pad_gt(boxes, labels, masks, img_hw, max_gt: int = MAX_GT):
    """Pad annotations to static capacity with a validity mask."""
    g = min(len(boxes), max_gt)
    out_boxes = np.zeros((max_gt, 4), np.float32)
    out_labels = np.zeros((max_gt,), np.int32)
    out_valid = np.zeros((max_gt,), bool)
    out_masks = np.zeros((max_gt, *img_hw), np.float32)
    if g:
        out_boxes[:g] = boxes[:g]
        out_labels[:g] = labels[:g]
        out_valid[:g] = True
        if masks is not None and len(masks):
            mh, mw = masks.shape[1:]
            out_masks[:g, :mh, :mw] = masks[:g]
    return out_boxes, out_labels, out_valid, out_masks


def detector_param_labels(params):
    """AdamW paramwise recipe: 'no_decay' for norm scales/biases and
    relative-position tables, 'decay' elsewhere (config optimizer
    paramwise_cfg)."""
    import jax

    def label(path, leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        joined = "/".join(keys)
        if "relative_position_bias_table" in joined or "norm" in joined.lower() \
                or keys[-1] in ("bias", "scale"):
            return "no_decay"
        return "decay"

    return jax.tree_util.tree_map_with_path(label, params)


def detector_lr_schedule(base_lr: float = 1e-4, steps_per_epoch: int = 1000,
                         warmup_iters: int = 500, warmup_ratio: float = 1e-3):
    """The reference detector schedule: mmcv linear warmup over the first
    500 iters (factor 1 - (1 - step/iters) * (1 - ratio), so step 0 trains at
    base_lr*1e-3 — Swin…/configs/_base_/schedules/schedule_1x.py:7-9) into a
    step decay x0.1 at epochs 27 and 33."""
    import optax

    boundaries = {27 * steps_per_epoch: 0.1, 33 * steps_per_epoch: 0.1}
    decay = optax.piecewise_constant_schedule(base_lr, boundaries)

    def sched(step):
        import jax.numpy as jnp
        frac = jnp.minimum(step / warmup_iters, 1.0)
        factor = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
        return decay(step) * factor

    return sched


def detector_optimizer(params, base_lr: float = 1e-4, weight_decay: float = 0.05,
                       steps_per_epoch: int = 1000, epochs: int = 36,
                       warmup_iters: int = 500, warmup_ratio: float = 1e-3):
    """AdamW + linear warmup + step decay at epochs 27/33 (x0.1 each),
    paramwise no-decay."""
    import optax

    sched = detector_lr_schedule(base_lr, steps_per_epoch, warmup_iters,
                                 warmup_ratio)
    labels = detector_param_labels(params)
    tx = optax.multi_transform(
        {"decay": optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=weight_decay),
         "no_decay": optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=0.0)},
        labels)
    return tx
