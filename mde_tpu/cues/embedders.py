"""Device-side cue embedding — the TPU-native ExternalInfoLoaders.

The reference's SemanticsLoader / InstanceSegmentationLoader run per batch on
the host + H2D copies (reference ExternalInfoLoaders/SemanticsLoader.py:102-145,
InstanceSegmentationLoader.py:89-121), including an unvectorized
O(classes x batch) python double loop for per-class areas
(SemanticsLoader.py:88-99, flagged "Needs vectorisation" in-tree).

Here the raw int32 label maps ride the batch onto the device and everything
else is traced into the train step:
  * word-embedding lookup  -> one jnp.take gather, fused by XLA
  * per-class image areas  -> one-hot histogram matmul + gather (vectorized)
  * human-size lookup      -> jnp.take on the (101, 3) table
Tables are tiny (<= 150 x 300 f32) and live as closure constants baked into
the compiled executable.
"""

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data")


def _load(name: str) -> np.ndarray:
    return np.load(os.path.join(_DATA_DIR, name)).astype(np.float32)


def semantics_table_path(use_semantics: str) -> Optional[str]:
    """Embedding table selection (reference SemanticsLoader.py:32-55)."""
    if use_semantics is None:
        return None
    if use_semantics == "glove":
        return "ade20k_150_classes_glove_840b_300d_embeddings.npy"
    if use_semantics in ("glove-25d", "glove-25d-inst-areas"):
        return "ade20k_150_classes_glove_twitter_27b_25d_embeddings.npy"
    if "ade20k-places" in use_semantics:
        if "random" in use_semantics:
            return "ade20k_places_classes_25d_embeddings_random.npy"
        if "glove-25d" in use_semantics:
            if "size_shuffled" in use_semantics:
                return "ade20k_places_classes_glove_twitter_27b_25d_embeddings_shuffled.npy"
            return "ade20k_places_classes_glove_twitter_27b_25d_embeddings.npy"
    return None


def human_sizes_path_semantics(use_semantics: str) -> Optional[str]:
    """Human-sizes table selection (reference SemanticsLoader.py:58-71)."""
    if use_semantics is None or "human-sizes" not in use_semantics:
        return None
    if "ade20k-places" not in use_semantics:
        raise ValueError("Error: human-sizes not implemented for semantics other than ade20k-places.")
    if "shuffled" in use_semantics:
        return "ade20k_classes_abs_sizes_shuffled.npy"
    return "ade20k_classes_abs_sizes.npy"


class SemanticsEmbedder:
    """Turns raw semantic label maps (N,H,W,1 int32) into dense cue channels.

    Output channel layout matches what the model's forward expects
    (reference SemanticsLoader.py:102-145): [embedding (25/300) |
    optional per-class areas (1) | optional human sizes (3)].
    """

    def __init__(self, args):
        self.mode = args.use_semantics
        self.embeddings = None
        self.human_sizes = None
        if self.mode is None:
            return
        table = semantics_table_path(self.mode)
        if table is not None:
            self.embeddings = jnp.asarray(_load(table))
        hs = human_sizes_path_semantics(self.mode)
        if hs is not None:
            self.human_sizes = jnp.asarray(_load(hs))

    def __call__(self, semantics_raw):
        """semantics_raw: (N, H, W, 1) int. Returns (raw_clamped, embedded) or
        (None, None) when semantics are unused."""
        if self.mode is None:
            return None, None
        raw = semantics_raw.astype(jnp.int32)

        if "ade20k-places" in self.mode:
            # 100 real classes + background=100; out-of-range -> background
            # (reference SemanticsLoader.py:115-118).
            raw = jnp.where((raw > 100) | (raw < 0), 100, raw)

        labels = raw[..., 0]                                            # (N, H, W)
        if "raw" in self.mode:
            sem = raw.astype(jnp.float32)
        else:
            sem = jnp.take(self.embeddings, labels, axis=0)             # (N,H,W,C)

        if "inst-areas" in self.mode:
            sem = jnp.concatenate([sem, per_class_area_map(labels, self.embeddings.shape[0])],
                                  axis=-1)

        if self.human_sizes is not None:
            sizes = jnp.take(self.human_sizes, labels, axis=0)          # (N,H,W,3)
            sem = jnp.concatenate([sem, sizes], axis=-1)
        return raw, sem


def per_class_area_map(labels_nhw, num_classes: int):
    """Per-pixel fraction of the image occupied by that pixel's class
    (vectorized replacement for reference SemanticsLoader.py:88-99).

    One-hot histogram (a small matmul XLA turns into a segment-sum) then a
    gather back through the label map.
    """
    n, h, w = labels_nhw.shape
    total = h * w
    counts = jnp.zeros((n, num_classes), jnp.float32).at[
        jnp.arange(n)[:, None], labels_nhw.reshape(n, -1)].add(1.0)
    frac = counts / total
    return jnp.take_along_axis(frac, labels_nhw.reshape(n, -1), axis=1).reshape(n, h, w, 1)


class InstanceEmbedder:
    """Instance-cue embedding (reference InstanceSegmentationLoader.py:31-121).

    __call__(labels_raw, areas_raw) -> (labels_raw_clamped, label_embeddings,
    areas[+sizes]) with all maps (N, H, W, C)."""

    def __init__(self, args):
        self.mode = args.use_instance_segmentation
        self.embeddings = None
        self.human_sizes = None
        self.background_class = None
        if self.mode is None:
            return
        if self.mode == "raw":
            raise ValueError("Error: raw instance semantics not implemented")
        if self.mode == "coco":
            self.embeddings = jnp.asarray(_load(
                "coco_81_classes_maskrcnn_ordering_glove_twitter_27b_25d_embeddings.npy"))
            self.background_class = 0
        elif "ade20k_swin" in self.mode:
            self.embeddings = jnp.asarray(_load(
                "ade20k_places_classes_glove_twitter_27b_25d_embeddings.npy"))
            self.background_class = 100
            if "human_sizes" in self.mode:
                name = ("ade20k_classes_abs_sizes_shuffled.npy" if "shuffled" in self.mode
                        else "ade20k_classes_abs_sizes.npy")
                self.human_sizes = jnp.asarray(_load(name))
        assert self.embeddings is not None and self.background_class is not None

    def __call__(self, instance_labels_raw, instance_areas_raw):
        if self.mode is None:
            return None, None, None
        raw = instance_labels_raw.astype(jnp.int32)
        nrows = self.embeddings.shape[0]
        raw = jnp.where((raw < 0) | (raw > nrows - 1), self.background_class, raw)
        labels = raw[..., 0]

        emb = jnp.take(self.embeddings, labels, axis=0)                 # (N,H,W,25)
        areas = instance_areas_raw.astype(jnp.float32)                  # (N,H,W,1)
        if self.human_sizes is not None:
            sizes = jnp.take(self.human_sizes, labels, axis=0)          # (N,H,W,3)
            areas = jnp.concatenate([areas, sizes], axis=-1)
        return raw, emb, areas
