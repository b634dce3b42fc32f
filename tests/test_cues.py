"""Cue-embedder tests against the reference loaders' documented semantics
(SemanticsLoader.py / InstanceSegmentationLoader.py)."""

import types

import jax.numpy as jnp
import numpy as np

from mde_tpu.cues import SemanticsEmbedder, InstanceEmbedder
from mde_tpu.cues.embedders import per_class_area_map, _load


def _args(**kw):
    base = dict(use_semantics=None, use_instance_segmentation=None)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_semantics_disabled_returns_none():
    emb = SemanticsEmbedder(_args())
    assert emb(jnp.zeros((1, 4, 4, 1), jnp.int32)) == (None, None)


def test_semantics_glove25d_gather():
    emb = SemanticsEmbedder(_args(use_semantics="glove-25d"))
    table = _load("ade20k_150_classes_glove_twitter_27b_25d_embeddings.npy")
    labels = np.array([[[0], [5]], [[149], [7]]], dtype=np.int32)[None]
    raw, sem = emb(jnp.asarray(labels))
    assert sem.shape == (1, 2, 2, 25)
    np.testing.assert_allclose(np.asarray(sem[0, 0, 0]), table[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sem[0, 1, 0]), table[149], rtol=1e-6)


def test_semantics_ade20k_places_clamping():
    emb = SemanticsEmbedder(_args(use_semantics="glove-25d-ade20k-places"))
    table = _load("ade20k_places_classes_glove_twitter_27b_25d_embeddings.npy")
    labels = np.array([[[-1], [250]], [[3], [100]]], dtype=np.int32)[None]
    raw, sem = emb(jnp.asarray(labels))
    # invalid labels -> background (100)
    np.testing.assert_array_equal(np.asarray(raw[0, :, :, 0]), [[100, 100], [3, 100]])
    np.testing.assert_allclose(np.asarray(sem[0, 0, 0]), table[100], rtol=1e-6)


def test_semantics_human_sizes_channels():
    emb = SemanticsEmbedder(_args(use_semantics="glove-25d-ade20k-places-human-sizes"))
    labels = np.full((1, 3, 3, 1), 7, dtype=np.int32)
    _, sem = emb(jnp.asarray(labels))
    assert sem.shape == (1, 3, 3, 28)  # 25 embed + 3 sizes
    sizes = _load("ade20k_classes_abs_sizes.npy")
    np.testing.assert_allclose(np.asarray(sem[0, 0, 0, 25:]), sizes[7], rtol=1e-6)


def test_per_class_area_map_matches_loop():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 10, size=(2, 8, 9)).astype(np.int32)
    ours = np.asarray(per_class_area_map(jnp.asarray(labels), 150))[..., 0]
    total = 8 * 9
    for im in range(2):
        for lab in np.unique(labels[im]):
            sel = labels[im] == lab
            expected = sel.sum() / total
            np.testing.assert_allclose(ours[im][sel], expected, rtol=1e-6)


def test_semantics_inst_areas_channel_layout():
    emb = SemanticsEmbedder(_args(use_semantics="glove-25d-inst-areas"))
    labels = np.zeros((1, 4, 4, 1), dtype=np.int32)
    _, sem = emb(jnp.asarray(labels))
    assert sem.shape == (1, 4, 4, 26)  # 25 embed + 1 area
    np.testing.assert_allclose(np.asarray(sem[..., 25]), 1.0)  # single class covers image


def test_instance_embedder_coco():
    emb = InstanceEmbedder(_args(use_instance_segmentation="coco"))
    assert emb.background_class == 0
    labels = np.array([[[-3], [80]], [[81], [1]]], dtype=np.int32)[None]
    areas = np.full((1, 2, 2, 1), 500, dtype=np.int32)
    raw, lab_emb, ar = emb(jnp.asarray(labels), jnp.asarray(areas))
    np.testing.assert_array_equal(np.asarray(raw[0, :, :, 0]), [[0, 80], [0, 1]])
    assert lab_emb.shape == (1, 2, 2, 25)
    np.testing.assert_allclose(np.asarray(ar), 500.0)


def test_instance_embedder_swin_human_sizes():
    emb = InstanceEmbedder(_args(use_instance_segmentation="ade20k_swin_human_sizes"))
    assert emb.background_class == 100
    labels = np.full((1, 2, 2, 1), 42, dtype=np.int32)
    areas = np.full((1, 2, 2, 1), 123, dtype=np.int32)
    raw, lab_emb, ar = emb(jnp.asarray(labels), jnp.asarray(areas))
    assert ar.shape == (1, 2, 2, 4)  # area + 3 human sizes
    sizes = _load("ade20k_classes_abs_sizes.npy")
    np.testing.assert_allclose(np.asarray(ar[0, 0, 0, 1:]), sizes[42], rtol=1e-6)
