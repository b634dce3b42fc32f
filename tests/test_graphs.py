"""Figure-builder and colorizer smoke tests (reference GraphBuilder_NYUD2 +
train.py colorizers)."""

import numpy as np

from mde_tpu.utils.graphs import (GraphBuilderNYUD2, color_encode,
                                  visualize_semantics, load_color150)


def test_color_encode_and_visualize():
    colors = load_color150()
    labels = np.asarray([[0, 1], [-1, 149]])
    rgb = color_encode(labels, colors)
    assert rgb.shape == (2, 2, 3)
    np.testing.assert_array_equal(rgb[1, 0], [0, 0, 0])      # negative stays black
    np.testing.assert_array_equal(rgb[0, 0], colors[0])

    batch = visualize_semantics(labels[None, ..., None])
    assert batch.shape == (1, 2, 2, 3)


def test_graph_builder_grid():
    rng = np.random.default_rng(0)
    gb = GraphBuilderNYUD2(num_samples=2, semantics=True, instance_labels=False)
    assert gb.num_columns == 4
    rgbs = rng.random((2, 24, 32, 3)).astype(np.float32)
    gt = rng.random((2, 24, 32, 1)).astype(np.float32) * 10
    pred = rng.random((2, 24, 32, 1)).astype(np.float32) * 10
    sem = (rng.random((2, 24, 32, 3)) * 255).astype(np.uint8)
    gb.add_image(rgbs, gt, pred, semantics=sem)
    assert gb.fig is not None
    gb.reset()
    assert gb.curr_sample == 0
