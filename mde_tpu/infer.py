"""Library inference API (reference infer.py:66-149).

InferenceHelper: single-image / PIL / directory prediction with horizontal-flip
TTA averaging, bin-center extraction, and 16-bit png saving (x1000 nyu,
x256 kitti). The flip-TTA pair runs as ONE batched jitted forward (batch=2:
[image, flipped image]) instead of two sequential model calls — same math,
half the dispatches, and the model is compiled once per input shape.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .models import UnetAdaptiveBins
from .ops.resize import resize_bilinear_align_corners
from .data.transforms import normalize_image


class InferenceHelper:
    def __init__(self, dataset: str = "nyu", checkpoint_path: str = None,
                 n_bins: int = 256, encoder_name: str = "efficientnet-b1",
                 params=None, batch_stats=None):
        if dataset == "nyu":
            self.min_depth, self.max_depth, self.saving_factor = 1e-3, 10, 1000
        elif dataset == "kitti":
            self.min_depth, self.max_depth, self.saving_factor = 1e-3, 80, 256
        else:
            raise ValueError(f"dataset can be either 'nyu' or 'kitti' but got {dataset}")

        self.model = UnetAdaptiveBins(n_bins=n_bins, min_val=self.min_depth,
                                      max_val=self.max_depth,
                                      encoder_name=encoder_name, dtype=jnp.float32)
        if params is None:
            if checkpoint_path is None:
                raise ValueError("provide checkpoint_path or (params, batch_stats)")
            params, batch_stats = self._load(checkpoint_path, encoder_name)
        self.params = params
        self.batch_stats = batch_stats if batch_stats is not None else {}

        @jax.jit
        def _forward_tta(params, batch_stats, img):
            # batch = [image, hflip(image)] in one compile
            both = jnp.concatenate([img, img[:, :, ::-1, :]], axis=0)
            bins, pred = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, both, train=False)
            pred = jnp.clip(pred, self.min_depth, self.max_depth)
            p, p_lr = pred[:1], pred[1:, :, ::-1, :]
            final = 0.5 * (p + p_lr)
            final = resize_bilinear_align_corners(final, img.shape[1:3])
            final = jnp.clip(final, self.min_depth, self.max_depth)
            final = jnp.where(jnp.isinf(final), self.max_depth, final)
            final = jnp.where(jnp.isnan(final), self.min_depth, final)
            centers = 0.5 * (bins[:1, 1:] + bins[:1, :-1])
            return centers, final

        self._forward_tta = _forward_tta

    def _load(self, path, encoder_name):
        if os.path.isdir(path):
            from .checkpoint import load_checkpoint
            state, _ = load_checkpoint(path)
            return state["params"], state.get("batch_stats", {})
        from .checkpoint import convert_reference_checkpoint
        params, stats = convert_reference_checkpoint(path, encoder_name)
        to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        return to_dev(params), to_dev(stats)

    def predict(self, image_nhwc):
        """image: normalized (1, H, W, 3). Returns (bin centers within range,
        depth (1, H, W, 1)) — reference infer.py:106-130."""
        centers, final = self._forward_tta(self.params, self.batch_stats,
                                           jnp.asarray(image_nhwc))
        centers = np.asarray(centers).squeeze()
        centers = centers[(centers > self.min_depth) & (centers < self.max_depth)]
        return centers, np.asarray(final)

    def predict_pil(self, pil_image, visualized: bool = False):
        img = np.asarray(pil_image, dtype=np.float32) / 255.0
        img = normalize_image(img)[None]
        centers, pred = self.predict(img)
        if visualized:
            from .utils import colorize
            viz = colorize(pred[0, ..., 0], vmin=None, vmax=None, cmap="magma")
            return centers, pred, Image.fromarray(viz)
        return centers, pred

    def predict_dir(self, test_dir: str, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        for f in sorted(glob.glob(os.path.join(test_dir, "*"))):
            image = np.asarray(Image.open(f), dtype=np.float32) / 255.0
            image = normalize_image(image)[None]
            centers, final = self.predict(image)
            out = (final[0, ..., 0] * self.saving_factor).astype("uint16")
            basename = os.path.basename(f).split(".")[0]
            Image.fromarray(out).save(os.path.join(out_dir, basename + ".png"))
