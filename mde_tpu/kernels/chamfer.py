"""Pallas TPU kernel for the bins-chamfer loss — forward + analytic VJP.

The chamfer loss needs, per image, reductions over a (pixels x bins) distance
matrix that is too large to materialize (416x544 pixels x 256 bins x batch
~= 2 GB f32). The jnp fallback (ops/losses.py) streams lax.scan chunks; this
kernel forms each (bins x tile) distance block directly in VMEM so HBM
traffic is one read of the depth map plus tiny per-tile partials.

Layout is Mosaic-friendly by construction: distances live as (P, TILE) with
bins on sublanes and pixels on lanes, so every reduction is a plain lane
(axis 1 -> (P, 1)) or sublane (axis 0 -> (1, TILE)) reduce — no scalar
accumulators, no gathers. Per-tile partials are combined by XLA outside the
kernel (T <= ~120 tiles of (P,) values — negligible).

One pass yields everything the value and gradient need:
  min_per_bin[b]   min over valid pixels of (c_b - d)^2          (cham_x)
  nearest_d[b]     depth achieving that min (tie-averaged)       (d cham_x/dc)
  cnt_per_bin[b]   #valid pixels whose nearest bin is b          (d cham_y/dc)
  sum_d_per_bin[b] sum of those pixels' depths                   (d cham_y/dc)
  y_min[i]         per-pixel min over bins (masked)              (cham_y)

loss = mean_i[ mean_b min_per_bin ] + mean_i[ sum_i y_min / cnt ]
dloss/dc_b = 2 (c_b - nearest_d_b) / (P N)                       (x-side)
           + 2 (cnt_b c_b - sum_d_b) / (cnt N)                   (y-side)

Gradients flow to bin centers only (depth is ground truth), matching
pytorch3d's chamfer under the reference's usage (loss.py:45).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38


_LANES = 128

# Flipped by CPU tests / the multichip dryrun (monkeypatch) to run the Mosaic
# kernel interpreted; train/loop.py doesn't plumb an interpret flag through.
FORCE_INTERPRET = False


def _chamfer_kernel(centers_ref, depth_ref, valid_ref,
                    minpb_ref, neard_ref, cntpb_ref, sumdpb_ref, ymin_ref):
    """Grid over pixel tiles. Accumulators are lane-cyclic (P, 128) blocks
    revisited every step (constant index_map); each tile is processed in
    static 128-lane chunks so every op is a plain (P, 128) elementwise or a
    sublane reduce — the shapes Mosaic lowers without restriction."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        minpb_ref[:] = jnp.full_like(minpb_ref, _BIG)
        neard_ref[:] = jnp.zeros_like(neard_ref)
        cntpb_ref[:] = jnp.zeros_like(cntpb_ref)
        sumdpb_ref[:] = jnp.zeros_like(sumdpb_ref)

    c = centers_ref[:]                                   # (P, 1)
    tile = depth_ref.shape[1]

    acc_min = minpb_ref[:]
    acc_near = neard_ref[:]
    acc_cnt = cntpb_ref[:]
    acc_sumd = sumdpb_ref[:]

    for k in range(tile // _LANES):
        sl = slice(k * _LANES, (k + 1) * _LANES)
        d = depth_ref[:, sl]                             # (1, 128)
        v = valid_ref[:, sl] > 0.0                       # (1, 128)
        diff = c - d                                     # (P, 128)
        d2 = diff * diff

        # cham_y: per-pixel min over bins (sublane reduce)
        y_min = jnp.min(d2, axis=0, keepdims=True)       # (1, 128)
        ymin_ref[:, sl] = jnp.where(v, y_min, 0.0)

        # fractional nearest-bin assignment (ties split evenly)
        at_y = (d2 == y_min).astype(jnp.float32)
        at_y = at_y / jnp.maximum(jnp.sum(at_y, axis=0, keepdims=True), 1.0)
        at_y = jnp.where(v, at_y, 0.0)
        acc_cnt = acc_cnt + at_y
        acc_sumd = acc_sumd + at_y * d

        # cham_x: running per-(bin, lane) min with nearest-depth payload
        d2_masked = jnp.where(v, d2, _BIG)
        better = d2_masked < acc_min
        acc_min = jnp.where(better, d2_masked, acc_min)
        acc_near = jnp.where(better, jnp.broadcast_to(d, d2.shape), acc_near)

    minpb_ref[:] = acc_min
    neard_ref[:] = acc_near
    cntpb_ref[:] = acc_cnt
    sumdpb_ref[:] = acc_sumd


def _chamfer_reductions(depth_flat, valid_flat, centers, tile: int,
                        interpret: bool = False):
    """Per-image reductions. Returns (minpb, neard, cntpb, sumdpb, sumy, cnt)."""
    m = depth_flat.shape[0]
    p = centers.shape[0]
    nt = m // tile
    minpb_l, neard_l, cntpb_l, sumdpb_l, ymin = pl.pallas_call(
        _chamfer_kernel,
        grid=(nt,),
        cost_estimate=pl.CostEstimate(
            # ~10 VPU ops per (bin, pixel) pair; reads one (1, m) depth +
            # valid row, writes tiny per-tile partials
            flops=10 * p * m,
            bytes_accessed=2 * m * 4 + 5 * p * _LANES * 4,
            transcendentals=0),
        in_specs=[
            pl.BlockSpec((p, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ],
        interpret=interpret,
    )(centers.reshape(p, 1), depth_flat.reshape(1, m), valid_flat.reshape(1, m))

    # fold the 128 lane-cyclic partials (tiny, XLA fuses this)
    best_lane = jnp.argmin(minpb_l, axis=1)                          # (P,)
    minpb = jnp.min(minpb_l, axis=1)
    neard = jnp.take_along_axis(neard_l, best_lane[:, None], axis=1)[:, 0]
    cntpb = jnp.sum(cntpb_l, axis=1)
    sumdpb = jnp.sum(sumdpb_l, axis=1)
    sumy = jnp.sum(ymin)
    cnt = jnp.sum(valid_flat)
    return minpb, neard, cntpb, sumdpb, sumy, cnt


def _prep(centers, target_depth, valid_threshold, tile):
    n, p = centers.shape
    d = target_depth.astype(jnp.float32).reshape(n, -1)
    m = d.shape[1]
    # tiles are processed in 128-lane chunks; clamp to a lane multiple
    tile = max(_LANES, (min(tile, m) // _LANES) * _LANES)
    pad = (-m) % tile
    if pad:
        d = jnp.pad(d, ((0, 0), (0, pad)))
    valid = ((d >= valid_threshold) &
             (jnp.arange(d.shape[1])[None, :] < m)).astype(jnp.float32)
    return d, valid, tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def chamfer_from_centers(centers, target_depth_nhwc, valid_threshold=1e-3,
                         tile=2048, interpret=False):
    value, _ = _chamfer_fwd(centers, target_depth_nhwc, valid_threshold, tile,
                            interpret)
    return value


def _chamfer_fwd(centers, target_depth_nhwc, valid_threshold, tile, interpret):
    centers = centers.astype(jnp.float32)
    n, p = centers.shape
    d, valid, tile = _prep(centers, target_depth_nhwc, valid_threshold, tile)

    fn = jax.vmap(functools.partial(_chamfer_reductions, tile=tile,
                                    interpret=interpret))
    minpb, neard, cntpb, sumdpb, sumy, cnt = fn(d, valid, centers)

    has_valid = cnt > 0
    cham_x = jnp.where(has_valid,
                       jnp.mean(jnp.where(minpb >= _BIG, 0.0, minpb), axis=1), 0.0)
    cham_y = jnp.where(has_valid, sumy / jnp.maximum(cnt, 1.0), 0.0)
    value = jnp.mean(cham_x) + jnp.mean(cham_y)
    residuals = (centers, minpb, neard, cntpb, sumdpb, cnt)
    return value, residuals


def _chamfer_bwd(valid_threshold, tile, interpret, residuals, g):
    centers, minpb, neard, cntpb, sumdpb, cnt = residuals
    n, p = centers.shape
    has_valid = (cnt > 0).astype(jnp.float32)[:, None]
    bin_hit = (minpb < _BIG).astype(jnp.float32)
    # x-side: d/dc_b mean_b (c_b - nearest)^2 = 2 (c_b - nearest_b) / P
    gx = 2.0 * (centers - neard) * bin_hit / p
    # y-side: d/dc_b sum_assigned (c_b - d_i)^2 / cnt = 2 (cnt_b c_b - sum_d_b)/cnt
    gy = 2.0 * (cntpb * centers - sumdpb) / jnp.maximum(cnt, 1.0)[:, None]
    grad_centers = (gx + gy) * has_valid / n * g
    return grad_centers, None


chamfer_from_centers.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_1d_pallas(bin_edges: jnp.ndarray, target_depth_nhwc: jnp.ndarray,
                      valid_threshold: float = 1e-3, tile: int = 2048,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.losses.bins_chamfer_loss backed by the Pallas kernel.
    Differentiable w.r.t. bin_edges (gradients flow through the centers)."""
    interpret = interpret or FORCE_INTERPRET
    centers = 0.5 * (bin_edges[:, 1:] + bin_edges[:, :-1])
    return chamfer_from_centers(centers, target_depth_nhwc, valid_threshold,
                                tile, interpret)
