"""Pallas TPU depthwise conv (stride 1, odd K, TF-SAME) with fused VJP.

Why: the EfficientNet encoder's backward is the dominant segment of the
flagship train step, running at ~5 TFLOP/s because its depthwise convs
(reference gen-efficientnet MBConv blocks; our models/efficientnet.py) carry
almost no FLOPs but large activation traffic, and XLA:TPU lowers
feature_group_count==C convolutions through generic conv machinery. The
measured alternative of K^2 shifted strided-slice FMAs at the XLA level
(`--dw_impl shifts`) LOSES 1.6x end-to-end (probe_step_perf 2026-08-18)
because each of the K^2 slices re-reads the padded input from HBM. The fix
is what only a kernel can do: DMA each input tile (with its K-1 halo rows)
into VMEM once and take all K^2 taps from VMEM registers.

Layout: NHWC with H zero-padded by p=(K-1)//2 and flattened to rows, so a
row tile of TH output rows needs one contiguous slab of (TH+2p)*W + 2p flat
rows — a single DMA, no channel padding required (C stays native on lanes;
Mosaic masks the partial lane tile). W-edge taps that would cross a row
boundary in the flat layout are masked with an iota-mod-W sublane predicate.
Only stride 1 is kerneled: the four stride-2 stage-transition convs run at
half output resolution and stay on the XLA path (models/efficientnet.py).

Backward is a single fused kernel per tile: both dx (depthwise conv of dy
with the spatially flipped kernel — exact for stride 1 SAME) and dweight
(per-tap masked reduce of x * dy) come from ONE DMA each of the x and dy
slabs, accumulating dweight across the grid in a VMEM-resident (K*K, C)
f32 block.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped by CPU tests (monkeypatch) to run the Mosaic kernel interpreted;
# the model call sites don't plumb an interpret flag through flax.
FORCE_INTERPRET = False

# Per-slab cap when picking TH. The scoped-VMEM stack limit is 16M per
# kernel and the real high-water mark is several times the slab: fwd holds
# slab + double-buffered out block + an f32 accumulator + unrolled-tap
# temporaries; bwd holds two slabs and two f32 (thw, C) values. 3M slabs
# OOMed the 16M limit on real Mosaic (18.97M measured at th=26, C=128);
# 1M keeps the worst case ~8M.
_SLAB_BUDGET_BYTES = 1024 * 1024


def _sublane_align(itemsize: int) -> int:
    """Mosaic sublane-tile granularity: (8,128) f32, (16,128) bf16. DMA
    slices along the second-minor dim must be tile-aligned in start offset
    and length (enforced only on real Mosaic, not in interpret mode)."""
    return 8 * max(1, 4 // itemsize)


def _pick_th(h: int, w: int, c: int, p: int, itemsize: int) -> int:
    """Largest divisor of H whose input slab fits the VMEM budget AND whose
    tile start offsets are sublane-aligned: th*w must be a multiple of the
    sublane tile unless there is only one row tile (offset 0)."""
    align = _sublane_align(itemsize)
    c_pad = -(-c // 128) * 128          # lanes Mosaic will materialize
    for th in range(h, 0, -1):
        if h % th:
            continue
        if th != h and (th * w) % align:
            continue
        slab = ((th + 2 * p) * w + 2 * p) * c_pad * itemsize
        if slab <= _SLAB_BUDGET_BYTES:
            return th
    return h   # single tile: offset 0 is always aligned; may exceed budget


def _round_align(n: int, align: int) -> int:
    return -(-n // align) * align


def _wpos_masks(k: int, p: int, thw: int, w: int):
    """Per-dj sublane masks: output col w takes tap dj iff 0 <= w+dj-p < W."""
    wpos = jax.lax.broadcasted_iota(jnp.int32, (thw, 1), 0) % w
    masks = {}
    for dj in range(k):
        d = dj - p
        if d < 0:
            masks[dj] = wpos >= -d
        elif d > 0:
            masks[dj] = wpos < w - d
        else:
            masks[dj] = None
    return masks


def _fwd_kernel(x_hbm, w_ref, out_ref, slab, sem, *, k, p, th, w, dtype):
    b = pl.program_id(0)
    rt = pl.program_id(1)
    thw = th * w
    slab_pad = _round_align((th + 2 * p) * w + 2 * p,
                            _sublane_align(jnp.dtype(dtype).itemsize))
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(rt * thw, slab_pad), :], slab, sem)
    cp.start()
    cp.wait()
    masks = _wpos_masks(k, p, thw, w)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for di in range(k):
        for dj in range(k):
            off = di * w + dj
            tap = slab[off:off + thw, :].astype(jnp.float32)
            contrib = tap * w_ref[di * k + dj:di * k + dj + 1, :]
            if masks[dj] is not None:
                contrib = jnp.where(masks[dj], contrib, 0.0)
            acc = acc + contrib
    out_ref[0] = acc.astype(dtype)


def _bwd_kernel(xs_hbm, gs_hbm, w_ref, dx_ref, dw_ref, xslab, gslab, sems,
                *, k, p, th, w, dtype):
    b = pl.program_id(0)
    rt = pl.program_id(1)
    thw = th * w
    slab_pad = _round_align((th + 2 * p) * w + 2 * p,
                            _sublane_align(jnp.dtype(dtype).itemsize))
    cpx = pltpu.make_async_copy(
        xs_hbm.at[b, pl.ds(rt * thw, slab_pad), :], xslab, sems.at[0])
    cpg = pltpu.make_async_copy(
        gs_hbm.at[b, pl.ds(rt * thw, slab_pad), :], gslab, sems.at[1])
    cpx.start()
    cpg.start()

    @pl.when(jnp.logical_and(b == 0, rt == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    cpx.wait()
    cpg.wait()
    masks = _wpos_masks(k, p, thw, w)
    # dy rows of this tile sit at the slab center (offset p rows + p cols)
    g_center = gslab[p * w + p:p * w + p + thw, :].astype(jnp.float32)
    acc_dx = jnp.zeros(dx_ref.shape[1:], jnp.float32)
    dw_rows = []
    for di in range(k):
        for dj in range(k):
            off = di * w + dj
            flip = (k - 1 - di) * k + (k - 1 - dj)
            tap_g = gslab[off:off + thw, :].astype(jnp.float32)
            contrib = tap_g * w_ref[flip:flip + 1, :]
            tap_x = xslab[off:off + thw, :].astype(jnp.float32)
            prod = tap_x * g_center
            if masks[dj] is not None:
                contrib = jnp.where(masks[dj], contrib, 0.0)
                prod = jnp.where(masks[dj], prod, 0.0)
            acc_dx = acc_dx + contrib
            dw_rows.append(jnp.sum(prod, axis=0, keepdims=True))
    dx_ref[0] = acc_dx.astype(dtype)
    dw_ref[...] += jnp.concatenate(dw_rows, axis=0)


def _flatten_padded(x, p, tail_pad, c_pad):
    """(B, H, W, C) -> (B, (H+2p)*W + 2p + tail_pad, c_pad): H zero-pad then
    flat row pad, so slab index (r+di)*W + w+dj is in-bounds for every tap of
    every tile; tail_pad extends the last tile's slab to its aligned DMA
    length (the last tile's start + padded slab length must stay in bounds);
    c_pad rounds channels up to a full lane tile — Mosaic requires DMA slice
    extents on the minor dim to be 128-multiples, and TPU HBM tiling pads the
    minor dim to 128 anyway, so the explicit pad adds no physical traffic
    (XLA fuses the pad into the producer)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    flat = xp.reshape(b, (h + 2 * p) * w, c)
    return jnp.pad(flat, ((0, 0), (p, p + tail_pad), (0, c_pad - c)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv2d_pallas(x, kernel, interpret=False):
    """Depthwise conv, stride 1, odd K, TF-SAME. x (B,H,W,C) bf16/f32,
    kernel (K,K,1,C) — nn.Conv(feature_group_count=C) layout. Returns
    (B,H,W,C) in x.dtype with f32 tap accumulation."""
    out, _ = _dw_fwd(x, kernel, interpret)
    return out


def _dw_fwd(x, kernel, interpret):
    interpret = interpret or FORCE_INTERPRET
    b, h, w, c = x.shape
    k = kernel.shape[0]
    p = (k - 1) // 2
    th = _pick_th(h, w, c, p, x.dtype.itemsize)
    thw = th * w
    cp = _round_align(c, 128)
    slab_len = (th + 2 * p) * w + 2 * p
    slab_pad = _round_align(slab_len, _sublane_align(x.dtype.itemsize))
    xflat = _flatten_padded(x, p, slab_pad - slab_len, cp)
    wrows = jnp.pad(kernel.reshape(k * k, c).astype(jnp.float32),
                    ((0, 0), (0, cp - c)))
    body = functools.partial(_fwd_kernel, k=k, p=p, th=th, w=w, dtype=x.dtype)
    out = pl.pallas_call(
        body,
        grid=(b, h // th),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * k * k,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=0),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k * k, cp), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, thw, cp), lambda bb, rr: (bb, rr, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, cp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((slab_pad, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xflat, wrows)
    return out[..., :c].reshape(b, h, w, c), (x, kernel)


def _dw_bwd(interpret, residuals, g):
    interpret = interpret or FORCE_INTERPRET
    x, kernel = residuals
    b, h, w, c = x.shape
    k = kernel.shape[0]
    p = (k - 1) // 2
    g = g.astype(x.dtype)
    th = _pick_th(h, w, c, p, x.dtype.itemsize)
    thw = th * w
    cp = _round_align(c, 128)
    slab_len = (th + 2 * p) * w + 2 * p
    slab_pad = _round_align(slab_len, _sublane_align(x.dtype.itemsize))
    xflat = _flatten_padded(x, p, slab_pad - slab_len, cp)
    gflat = _flatten_padded(g, p, slab_pad - slab_len, cp)
    wrows = jnp.pad(kernel.reshape(k * k, c).astype(jnp.float32),
                    ((0, 0), (0, cp - c)))
    body = functools.partial(_bwd_kernel, k=k, p=p, th=th, w=w, dtype=x.dtype)
    dx, dw = pl.pallas_call(
        body,
        grid=(b, h // th),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * w * c * k * k,
            bytes_accessed=4 * b * h * w * c * x.dtype.itemsize,
            transcendentals=0),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k * k, cp), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, thw, cp), lambda bb, rr: (bb, rr, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, cp), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h * w, cp), x.dtype),
            jax.ShapeDtypeStruct((k * k, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab_pad, cp), x.dtype),
            pltpu.VMEM((slab_pad, cp), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xflat, gflat, wrows)
    dkernel = dw[:, :c].reshape(k, k, 1, c).astype(kernel.dtype)
    return dx[..., :c].reshape(b, h, w, c), dkernel


dw_conv2d_pallas.defvjp(_dw_fwd, _dw_bwd)


def dw_conv_supported(kernel_size: int, stride: int) -> bool:
    """True when this dw conv hits the kernel's (stride 1, odd K) layout."""
    return stride == 1 and kernel_size % 2 == 1
