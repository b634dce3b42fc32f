"""Pallas TPU kernel fusing the AdaBins head: 1x1 conv -> softmax over bins
-> bin-centers reduction (reference models/unet_adaptive_bins.py:230-238,
296-302; SURVEY §7 step 9).

The unfused path materializes per-pixel bin logits (B, H/2, W/2, n_bins) in
HBM, reads them back for the softmax, and reads the probabilities again for
the centers contraction — at the production operating point (bs16, 208x272,
256 bins) that is ~1 GB of HBM traffic per forward for a tensor that is
consumed immediately. This kernel streams pixel tiles through VMEM: the
logits block (n_bins x TILE) is produced by the MXU from the decoder
features and reduced to depth in-register, so HBM traffic is one read of the
(B, HW, 128) features and one (B, HW) depth write.

Layout follows kernels/chamfer.py: bins on sublanes, pixels on lanes, so the
softmax max/sum and the centers contraction are plain sublane reduces to
(1, TILE) rows, and per-step accumulators are (n_bins, 128) blocks folded
outside the kernel — the shapes Mosaic lowers without restriction.

Backward is analytic (custom_vjp), recomputing the logits block instead of
saving softmax probabilities:
  depth = sum_b p_b c_b,   p = softmax(x W + bias)
  dlogits_b = p_b (c_b - depth) * g
  dx = dlogits^T W,  dW += x^T dlogits,  dbias += sum_px dlogits,
  dcenters_b = sum_px p_b * g            (per image; centers are adaptive)

bfloat16 parity: when the features are bf16, the logits are rounded to bf16
before the bias add and the f32 softmax, reproducing the unfused
nn.Conv(dtype=bf16) -> astype(f32) -> softmax numerics bit-for-bit at the
bf16 rounding points.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128

# Flipped by CPU tests (monkeypatch) to run the Mosaic kernel interpreted;
# the model call sites don't plumb an interpret flag through flax.
FORCE_INTERPRET = False


def _logits_block(x, wt_ref, b_ref):
    """(TILE, 128) features -> (n_bins, TILE) f32 logits, with bf16 rounding
    matching the unfused nn.Conv(dtype=bf16) path when x is bf16."""
    wt = wt_ref[...].astype(x.dtype)                      # (N, 128)
    logits = jax.lax.dot_general(
        wt, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (N, TILE)
    if x.dtype == jnp.bfloat16:
        logits = (logits.astype(jnp.bfloat16)
                  + b_ref[...].astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        logits = logits + b_ref[...]
    return logits


def _softmax_parts(logits):
    m = jnp.max(logits, axis=0, keepdims=True)            # (1, TILE)
    e = jnp.exp(logits - m)                               # (N, TILE)
    s = jnp.sum(e, axis=0, keepdims=True)                 # (1, TILE)
    return e, s


def _fold_lanes(a, tile):
    """(N, TILE) -> (N, 128) by summing TILE/128 static lane chunks."""
    acc = a[:, 0:_LANES]
    for k in range(1, tile // _LANES):
        acc = acc + a[:, k * _LANES:(k + 1) * _LANES]
    return acc


def _fwd_kernel(x_ref, wt_ref, b_ref, c_ref, out_ref):
    x = x_ref[...]                                        # (TILE, 128)
    logits = _logits_block(x, wt_ref, b_ref)
    e, s = _softmax_parts(logits)
    w = jnp.sum(e * c_ref[...], axis=0, keepdims=True)    # (1, TILE)
    out_ref[...] = w / s


def _bwd_kernel(x_ref, wt_ref, b_ref, c_ref, g_ref,
                dx_ref, dwt_ref, db_ref, dc_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    x = x_ref[...]                                        # (TILE, 128)
    tile = x.shape[0]
    logits = _logits_block(x, wt_ref, b_ref)
    e, s = _softmax_parts(logits)
    p = e / s                                             # (N, TILE)
    c = c_ref[...]                                        # (N, 1)
    depth = jnp.sum(e * c, axis=0, keepdims=True) / s     # (1, TILE)
    g = g_ref[...]                                        # (1, TILE)

    pg = p * g                                            # (N, TILE)
    dc_ref[...] += _fold_lanes(pg, tile)
    dlog = pg * (c - depth)                               # (N, TILE) f32
    db_ref[...] += _fold_lanes(dlog, tile)

    dlog_c = dlog.astype(x.dtype)
    wt = wt_ref[...].astype(x.dtype)
    dx = jax.lax.dot_general(
        dlog_c, wt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (TILE, 128)
    dx_ref[...] = dx.astype(x.dtype)
    dwt_ref[...] += jax.lax.dot_general(
        dlog_c, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (N, 128)


def _pick_tile(hw: int) -> int:
    for tile in (512, 384, 256, _LANES):
        if hw % tile == 0:
            return tile
    raise ValueError(
        f"fused bins head needs the pixel count ({hw}) to be a multiple of "
        f"{_LANES}; use the jnp path for this resolution")


def _fwd_one(x, wt, bcol, ccol, interpret):
    hw = x.shape[0]
    n = wt.shape[0]
    tile = _pick_tile(hw)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(hw // tile,),
        cost_estimate=pl.CostEstimate(
            flops=2 * hw * _LANES * n,
            bytes_accessed=hw * _LANES * x.dtype.itemsize + hw * 4 + n * _LANES * 4,
            transcendentals=hw * n),
        in_specs=[
            pl.BlockSpec((tile, _LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, hw), jnp.float32),
        interpret=interpret,
    )(x, wt, bcol, ccol)
    return out[0]


def _bwd_one(x, wt, bcol, ccol, g, interpret):
    hw = x.shape[0]
    n = wt.shape[0]
    tile = _pick_tile(hw)
    dx, dwt, db, dc = pl.pallas_call(
        _bwd_kernel,
        grid=(hw // tile,),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * hw * _LANES * n,
            bytes_accessed=2 * hw * _LANES * x.dtype.itemsize + 2 * hw * 4
            + 3 * n * _LANES * 4,
            transcendentals=hw * n),
        in_specs=[
            pl.BlockSpec((tile, _LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, _LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hw, _LANES), x.dtype),
            jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(x, wt, bcol, ccol, g.reshape(1, hw))
    return dx, dwt, db, dc


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_core(x3, wt, bcol, c3, interpret):
    """x3 (B, HW, 128), wt (N, 128) f32, bcol (N, 1) f32, c3 (B, N, 1) f32
    -> depth (B, HW) f32."""
    out, _ = _fused_core_fwd(x3, wt, bcol, c3, interpret)
    return out


def _fused_core_fwd(x3, wt, bcol, c3, interpret):
    fn = jax.vmap(functools.partial(_fwd_one, interpret=interpret),
                  in_axes=(0, None, None, 0))
    return fn(x3, wt, bcol, c3), (x3, wt, bcol, c3)


def _fused_core_bwd(interpret, residuals, g):
    x3, wt, bcol, c3 = residuals
    fn = jax.vmap(functools.partial(_bwd_one, interpret=interpret),
                  in_axes=(0, None, None, 0, 0))
    dx3, dwt_b, db_b, dc_b = fn(x3, wt, bcol, c3, g.astype(jnp.float32))
    dwt = jnp.sum(dwt_b, axis=0)                          # (N, 128) f32
    db = jnp.sum(db_b, axis=(0, 2))[:, None]              # (N, 1)
    dc = jnp.sum(dc_b, axis=2)[..., None]                 # (B, N, 1)
    return dx3, dwt, db, dc


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_bins_head(features_nhwc: jnp.ndarray, conv_kernel: jnp.ndarray,
                    conv_bias: jnp.ndarray, centers: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Depth from decoder features without materializing the bin logits.

    features_nhwc: (B, H, W, 128) range-attention maps (model dtype)
    conv_kernel:   (1, 1, 128, n_bins) f32 — nn.Conv 'conv_out' layout
    conv_bias:     (n_bins,) f32
    centers:       (B, n_bins) f32 adaptive bin centers
    Returns (B, H, W, 1) f32, matching
    softmax(conv(features)) @ centers (unet_adaptive_bins.py:296-302).
    """
    interpret = interpret or FORCE_INTERPRET
    b, h, w, cin = features_nhwc.shape
    n = conv_kernel.shape[-1]
    if cin != _LANES or n % _LANES:
        raise ValueError(f"fused bins head expects 128 input channels and a "
                         f"lane-multiple bin count, got {cin} -> {n}")
    x3 = features_nhwc.reshape(b, h * w, cin)
    wt = conv_kernel.reshape(cin, n).T.astype(jnp.float32)
    bcol = conv_bias.astype(jnp.float32)[:, None]
    c3 = centers.astype(jnp.float32)[..., None]
    depth = _fused_core(x3, wt, bcol, c3, interpret)
    return depth.reshape(b, h, w, 1)


def fused_head_supported(h: int, w: int, n_bins: int) -> bool:
    """True when this resolution/bin count hits the kernel's layout."""
    return (h * w) % _LANES == 0 and n_bins % _LANES == 0
