"""Ops parity tests.

torch (CPU) is used as the numerical oracle for the interpolation and loss
semantics the reference relies on — we never import reference code, we verify
our TPU-first re-derivations reproduce the underlying torch operator math.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")  # skip cleanly where torch is absent
import torch.nn.functional as F  # noqa: E402

from mde_tpu.ops import (
    resize_bilinear_align_corners, resize_nearest,
    bin_edges_from_widths, bin_centers, depth_from_bins,
    silog_loss, bins_chamfer_loss, compute_errors,
)
from mde_tpu.ops.metrics import compute_errors_masked, eval_mask


@pytest.mark.parametrize("c", [3, 1])  # c=1 takes the squeezed-matmul layout
@pytest.mark.parametrize("in_hw,out_hw", [
    ((13, 17), (26, 34)),
    ((208, 272), (416, 544)),
    ((7, 9), (5, 6)),      # downsample
    ((5, 6), (5, 6)),      # identity
    ((1, 4), (3, 8)),      # degenerate axis
])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw, c):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, c), dtype=np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                        mode="bilinear", align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((416, 544), (208, 272)),
    ((10, 10), (3, 7)),
    ((3, 7), (10, 10)),
])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 4), dtype=np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                        mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_bin_edges_and_depth():
    rng = np.random.default_rng(2)
    widths = rng.random((2, 8), dtype=np.float32)
    widths = widths / widths.sum(axis=1, keepdims=True)
    edges = bin_edges_from_widths(jnp.asarray(widths), 1e-3, 10.0)
    assert edges.shape == (2, 9)
    np.testing.assert_allclose(np.asarray(edges[:, 0]), 1e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(edges[:, -1]), 1e-3 + (10.0 - 1e-3), rtol=1e-5)
    centers = bin_centers(edges)
    probs = rng.random((2, 4, 5, 8), dtype=np.float32)
    probs = probs / probs.sum(axis=-1, keepdims=True)
    depth = depth_from_bins(jnp.asarray(probs), centers)
    assert depth.shape == (2, 4, 5, 1)
    ref = (probs * np.asarray(centers)[:, None, None, :]).sum(-1)[..., None]
    np.testing.assert_allclose(np.asarray(depth), ref, rtol=1e-4, atol=1e-5)


def test_silog_matches_torch_formula():
    rng = np.random.default_rng(3)
    pred = rng.random((2, 8, 9, 1), dtype=np.float32) * 9 + 0.5
    target = rng.random((2, 16, 18, 1), dtype=np.float32) * 9 + 0.5
    mask = target > 2.0

    ours = float(silog_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))

    # torch oracle following reference loss.py:12-25 semantics
    p = F.interpolate(torch.from_numpy(pred).permute(0, 3, 1, 2), target.shape[1:3],
                      mode="bilinear", align_corners=True).permute(0, 2, 3, 1)
    t = torch.from_numpy(target)
    m = torch.from_numpy(mask)
    g = torch.log(p[m]) - torch.log(t[m])
    dg = torch.var(g) + 0.15 * torch.mean(g) ** 2
    ref = float(10 * torch.sqrt(dg))
    assert abs(ours - ref) < 1e-4


def _chamfer_bruteforce(edges, depth, thresh=1e-3):
    """Numpy oracle for pytorch3d chamfer_distance(x=centers, y=valid depths)."""
    centers = 0.5 * (edges[:, 1:] + edges[:, :-1])
    n = centers.shape[0]
    cham_x_sum, cham_y_sum = 0.0, 0.0
    for i in range(n):
        d = depth[i].reshape(-1)
        d = d[d >= thresh]
        c = centers[i]
        d2 = (c[:, None] - d[None, :]) ** 2
        cham_x_sum += d2.min(axis=1).mean()
        cham_y_sum += d2.min(axis=0).mean()
    return cham_x_sum / n + cham_y_sum / n


def test_bins_chamfer_matches_bruteforce():
    rng = np.random.default_rng(4)
    widths = rng.random((3, 16), dtype=np.float32)
    widths /= widths.sum(1, keepdims=True)
    edges = np.asarray(bin_edges_from_widths(jnp.asarray(widths), 1e-3, 10.0))
    depth = rng.random((3, 30, 40, 1), dtype=np.float32) * 10
    depth[depth < 0.4] = 0.0  # some invalid pixels
    ours = float(bins_chamfer_loss(jnp.asarray(edges), jnp.asarray(depth), chunk=128))
    ref = _chamfer_bruteforce(edges, depth)
    assert abs(ours - ref) < 1e-4 * max(1.0, abs(ref))


def test_bins_chamfer_no_valid_pixels_is_finite():
    edges = jnp.linspace(0.001, 10.0, 9)[None, :].repeat(2, 0)
    depth = jnp.zeros((2, 8, 8, 1))
    out = float(bins_chamfer_loss(edges, depth, chunk=16))
    assert np.isfinite(out) and out == 0.0


def test_compute_errors_masked_matches_numpy():
    rng = np.random.default_rng(5)
    gt = rng.random((480, 640), dtype=np.float32) * 9.9 + 0.05
    pred = np.clip(gt + rng.normal(0, 0.5, gt.shape).astype(np.float32), 1e-3, 10)
    valid = np.logical_and(gt > 1e-3, gt < 10)
    valid &= eval_mask(gt.shape, "nyu", eigen_crop=True)

    ref = compute_errors(gt[valid], pred[valid])
    dev = {k: float(v) for k, v in compute_errors_masked(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(valid)).items()}
    for k in ref:
        assert abs(ref[k] - dev[k]) < 2e-4, (k, ref[k], dev[k])


def test_running_average_dict():
    from mde_tpu.utils import RunningAverageDict
    rad = RunningAverageDict()
    rad.update({"a": 1.0, "b": 2.0})
    rad.update({"a": 3.0, "b": 4.0})
    assert rad.get_value() == {"a": 2.0, "b": 3.0}


def test_parse_cli_paramfile_with_overrides(tmp_path):
    from mde_tpu.config import TrainArgParser, parse_cli
    p = tmp_path / "params.txt"
    p.write_text("--bs 4\n--epochs 3\n")
    a = parse_cli(TrainArgParser(), [str(p), "--resume", "latest", "--epochs", "7"],
                  mode="train")
    assert a.bs == 4
    assert a.resume == "latest"
    assert a.epochs == 7  # CLI overrides the param file


@pytest.mark.parametrize("c", [5, 1])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 20), (37, 45)),
    ((37, 45), (16, 20)),
])
def test_bilinear_half_pixel_matches_torch(in_hw, out_hw, c):
    """align_corners=False (the HRNet / mmdet convention), both channel
    layouts of _separable_matmuls."""
    from mde_tpu.ops.resize import resize_bilinear_half_pixel

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, *in_hw, c), dtype=np.float32)
    ours = np.asarray(resize_bilinear_half_pixel(jnp.asarray(x), out_hw))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                        mode="bilinear", align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
