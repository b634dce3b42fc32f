"""Qualitative figure grids for NYUD2 runs (reference GraphBuilder_NYUD2.py:9-108)
plus the semantic colorizers from reference train.py:117-209.

Inputs here are NHWC numpy arrays (the framework's native layout); behavior —
per-sample RGB min/max normalization, shared GT/pred depth range with the
'inferno_r' map, optional semantics / instance-class columns — matches the
reference figure builder.
"""

import matplotlib

matplotlib.use("Agg")
import os

import numpy as np
from matplotlib import pyplot as plt


def load_color150():
    """ADE20K 150-class color table from data/color150.mat
    (reference train.py:41)."""
    from scipy.io import loadmat
    path = os.path.join(os.path.dirname(__file__), "..", "..", "data", "color150.mat")
    return loadmat(path)["colors"]


def color_encode(labelmap_hw: np.ndarray, colors: np.ndarray) -> np.ndarray:
    """Colorize an integer label map (H, W) -> (H, W, 3) uint8; labels < 0
    stay black (reference train.py:190-209, vectorized)."""
    labelmap = labelmap_hw.astype(int)
    out = np.zeros((*labelmap.shape, 3), dtype=np.uint8)
    valid = labelmap >= 0
    idx = np.clip(labelmap, 0, len(colors) - 1)
    out[valid] = colors[idx[valid]]
    return out


def visualize_semantics(semantics_n1hw_or_nhw1: np.ndarray) -> np.ndarray:
    """Batch label maps -> (N, H, W, 3) uint8 color images
    (reference train.py:117-141)."""
    sem = np.asarray(semantics_n1hw_or_nhw1)
    if sem.ndim == 4:
        sem = sem[..., 0] if sem.shape[-1] == 1 else sem[:, 0]
    colors = load_color150()
    return np.stack([color_encode(s, colors) for s in sem], axis=0)


class GraphBuilderNYUD2:
    """num_samples x (3..5) grid: RGB | GT depth | pred depth
    [| semantics | instance classes]."""

    def __init__(self, num_samples: int, semantics: bool = False,
                 instance_labels: bool = False):
        self.num_samples = num_samples
        self.semantics = semantics
        self.instance_labels = instance_labels
        self.num_columns = 3 + int(semantics) + int(instance_labels)
        self._make_fig()

    def _make_fig(self):
        width = self.num_columns * (7 / 3)
        height = self.num_samples * width / self.num_columns * 0.75 + 0.3
        self.fig, self.ax = plt.subplots(self.num_samples, self.num_columns,
                                         figsize=(width, height), squeeze=False)
        titles = ["RGB", "G.T. Depth", "Pred. Depth"]
        if self.semantics:
            titles.append("Input Semantics")
        if self.instance_labels:
            titles.append("Input Instance Classes")
        for i, t in enumerate(titles):
            self.ax[0, i].set_title(t)
        for axi in self.ax.ravel():
            axi.set_axis_off()
        self.curr_sample = 0

    def add_image(self, rgbs_nhwc, gt_depth_nhwc, pred_nhwc,
                  semantics=None, instance_labels=None):
        """All arrays NHWC numpy; semantics/instance_labels are (N, H, W, 3)
        pre-colorized maps (see visualize_semantics)."""
        if self.curr_sample > self.num_samples:
            return
        rgbs = np.asarray(rgbs_nhwc)
        gt = np.asarray(gt_depth_nhwc)[..., 0]
        pred = np.asarray(pred_nhwc)[..., 0]
        n = min(self.num_samples, rgbs.shape[0])
        for i in range(n):
            rgb = rgbs[i]
            rgb = (rgb - rgb.min()) / max(rgb.max() - rgb.min(), 1e-8)
            self.ax[i, 0].imshow(rgb)
            vmin, vmax = gt[i].min(), gt[i].max()
            self.ax[i, 1].imshow(gt[i], vmin=vmin, vmax=vmax, cmap="inferno_r")
            self.ax[i, 2].imshow(pred[i], vmin=vmin, vmax=vmax, cmap="inferno_r")
            col = 2
            if semantics is not None:
                col += 1
                self.ax[i, col].imshow(np.asarray(semantics)[i])
            if instance_labels is not None:
                col += 1
                self.ax[i, col].imshow(np.asarray(instance_labels)[i])
        self.curr_sample = n
        self.fig.tight_layout()
        self.fig.subplots_adjust(hspace=0.02, wspace=0.04)
        self.fig.dpi = 200

    def reset(self):
        plt.close(self.fig)
        self._make_fig()
