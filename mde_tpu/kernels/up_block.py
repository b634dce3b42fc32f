"""Pallas TPU fused decoder up-block: bilinear-upsample -> concat -> conv3x3.

Why: the UNet decoder's high-resolution blocks (models/decoder.py::UpSampleBN,
reference unet_adaptive_bins.py:39-53) are the train step's second-largest
segment after the encoder. probe_decoder_bisect (2026-08-19) measured up4
(in (B,104,136,160) + skip (B,208,272,16) -> (B,208,272,80) at bs16) at
16.2 ms forward vs a ~3.7 ms FLOP bound: XLA materializes the upsampled
tensor (290 MB at bs16 bf16), the concat (319 MB), and runs the 3x3 convs
at awkward channel counts. The fusion only a kernel can do: W-resize the
low-res rows into VMEM, take all nine conv taps of both the upsampled and
the skip operand from VMEM, and never materialize the upsampled or the
concatenated tensor in HBM.

Decomposition: bilinear resize is separable (ops/resize.py). The H-axis
matmul stays outside the kernel (a cheap 2-tap contraction at LOW-res W —
XLA lowers it well, and it gives each kernel row-tile a contiguous slab).
The kernel then, per (batch, row-tile) grid step:

  1. DMAs the H-resized slab ((TH+2) halo rows at low-res width w) and the
     skip slab ((TH+2) rows at full width W, flat-padded like kernels/
     dw_conv.py) into VMEM,
  2. W-resizes each slab row with one (W, w) x (w, C1) MXU matmul into a
     VMEM scratch (the upsampled tile never touches HBM),
  3. accumulates the 3x3 conv as 9 shifted tap-matmuls per operand
     (up: (THW, C1) x (C1, Co); skip: (THW, C2) x (C2, Co)) with the
     W-edge sublane masks of dw_conv, f32 accumulation, + bias.

Backward is one fused kernel producing d_xh (W-resize-transposed in VMEM),
d_skip, and both dW blocks (accumulated across the grid in VMEM residents,
dw_conv-style) from one DMA each of xh / skip / dy; the outer H-resize
transpose and the bias gradient are single XLA contractions.

Numerics match the production path: resize weights and conv operands are
consumed at bf16 (lax DEFAULT precision truncates the production f32
operands to bf16 on the MXU anyway) with f32 accumulation throughout.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.resize import _linear_weights_align_corners

# Tiling helpers inherited from the retired dw_conv Pallas kernel (95f019d;
# its conv itself lost 3x to XLA's grouped conv, but the slab/alignment
# machinery is load-bearing here).


def _sublane_align(itemsize: int) -> int:
    """Mosaic sublane-tile granularity: (8,128) f32, (16,128) bf16. DMA
    slices along the second-minor dim must be tile-aligned in start offset
    and length (enforced only on real Mosaic, not in interpret mode)."""
    return 8 * max(1, 4 // itemsize)


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


def _flatten_padded(x, p, tail_pad, c_pad):
    """(B, H, W, C) -> (B, (H+2p)*W + 2p + tail_pad, c_pad): H zero-pad then
    flat row pad, so slab index (r+di)*W + w+dj is in-bounds for every tap of
    every tile; tail_pad extends the last tile's slab to its aligned DMA
    length; c_pad rounds channels up to a full lane tile (Mosaic requires
    128-multiple DMA extents on the minor dim; HBM tiling pads it anyway,
    so the explicit pad adds no physical traffic)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    flat = xp.reshape(b, (h + 2 * p) * w, c)
    return jnp.pad(flat, ((0, 0), (p, p + tail_pad), (0, c_pad - c)))

# Flipped by CPU tests (monkeypatch) to run the Mosaic kernel interpreted.
FORCE_INTERPRET = False

# The scoped-VMEM limit is 16M and Mosaic's real stack high-water is ~2x the
# explicit buffer sum (measured on real hardware 2026-08-19: the fwd kernel
# at TH=16/up4 estimated 10.4M and allocated 21.17M — tap copies and dot
# operand temporaries double the footprint). Budget the ESTIMATE at 7.5M so
# the real allocation stays ~15M.
_VMEM_BUDGET = int(7.5 * 1024 * 1024)


def _cp(c: int) -> int:
    return _round_align(c, 128)


def _vmem_bytes(th, w_in, w_out, c1p, c2p, cop, it, mode):
    """Explicit buffer sum per kernel. Backward is SPLIT into two kernels so
    each fits scoped VMEM: 'bwd_data' (d_up/d_skip/d_xh — needs only the dy
    slab) and 'bwd_w' (dW accumulators — needs xh + dy + the up scratch but
    emits no big blocks)."""
    thw = th * w_out
    al = _sublane_align(it)
    xh_slab = _round_align((th + 2) * w_in, al) * c1p * it
    flat_slab = _round_align(thw + 2 * w_out + 2, al)
    up = ((th + 2) * w_out + 2) * c1p * it
    ww = w_out * w_in * it
    wu = 9 * c1p * cop * it
    wsk = 9 * c2p * cop * it
    if mode == "fwd":
        return (xh_slab + flat_slab * c2p * it + up + ww + wu + wsk
                + thw * cop * 4 + 2 * thw * cop * it)
    if mode == "bwd_data":
        return (flat_slab * cop * it + ww + wu + wsk
                + thw * c1p * 4 + thw * c2p * 4
                + 2 * th * w_in * c1p * it + 2 * thw * c2p * it)
    # bwd_w
    return (xh_slab + flat_slab * c2p * it + flat_slab * cop * it + up + ww
            + 9 * (c1p + c2p) * cop * 4)


def _pick_th(h_out, w_in, w_out, c1p, c2p, cop, it, mode):
    """Largest divisor of H whose slabs fit the VMEM budget and whose DMA
    start offsets (rt*th*w_in and rt*th*w_out) are sublane-aligned; a single
    tile (start 0) is exempt from the alignment condition."""
    align = _sublane_align(it)
    for th in range(h_out, 0, -1):
        if h_out % th:
            continue
        aligned = (th == h_out) or ((th * w_in) % align == 0
                                    and (th * w_out) % align == 0)
        if not aligned:
            continue
        if _vmem_bytes(th, w_in, w_out, c1p, c2p, cop, it, mode) <= _VMEM_BUDGET:
            return th
    return None


def up_supported(x_shape, skip_shape, out_features, dtype) -> bool:
    """True when (x, skip, Co) hit a layout the kernel can tile (all three
    kernels — the training step needs fwd AND both bwd passes to fit)."""
    if jnp.dtype(dtype).itemsize not in (2, 4):
        return False
    _, h, w_in, c1 = x_shape
    _, ho, w_out, c2 = skip_shape
    if h > ho or w_in > w_out:
        return False   # kernel is written for upsampling (halo math)
    it = jnp.dtype(dtype).itemsize
    cop = _cp(out_features)
    return all(
        _pick_th(ho, w_in, w_out, _cp(c1), _cp(c2), cop, it, mode) is not None
        for mode in ("fwd", "bwd_data", "bwd_w"))


def _flat_hpad(x, tail, c_pad):
    """(B,H,W,C) -> (B, (H+2)*W + tail, c_pad): one zero halo row above and
    below (TF-SAME conv H padding), flat rows, aligned tail + lane pad."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return jnp.pad(xp.reshape(b, (h + 2) * w, c),
                   ((0, 0), (0, tail), (0, c_pad - c)))


def _resize_rows(ww_ref, xh_slab, up, th, w_in, w_out, dtype):
    """W-resize each of the TH+2 slab rows into the scratch at +1 flat
    offset (the conv taps' pre-pad cell; see dw_conv's flat tap indexing)."""
    for r in range(th + 2):
        xrow = xh_slab[r * w_in:(r + 1) * w_in, :]
        urow = jax.lax.dot_general(
            ww_ref[...], xrow, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        up[1 + r * w_out:1 + (r + 1) * w_out, :] = urow.astype(dtype)


def _fwd_kernel(xh_hbm, sk_hbm, ww_ref, wu_ref, wsk_ref, b_ref, out_ref,
                xh_slab, sk_slab, up, sems, *, th, w_in, w_out, c1p, c2p,
                xh_len, sk_len, dtype):
    b = pl.program_id(0)
    rt = pl.program_id(1)
    thw = th * w_out
    cpx = pltpu.make_async_copy(
        xh_hbm.at[b, pl.ds(rt * th * w_in, xh_len), :], xh_slab, sems.at[0])
    cps = pltpu.make_async_copy(
        sk_hbm.at[b, pl.ds(rt * thw, sk_len), :], sk_slab, sems.at[1])
    cpx.start()
    cps.start()
    cpx.wait()
    _resize_rows(ww_ref, xh_slab, up, th, w_in, w_out, dtype)
    cps.wait()
    masks = _wpos_masks(3, 1, thw, w_out)
    acc = jnp.zeros((thw, out_ref.shape[-1]), jnp.float32)
    for di in range(3):
        for dj in range(3):
            off = di * w_out + dj
            t = di * 3 + dj
            tap_u = up[off:off + thw, :]
            tap_s = sk_slab[off:off + thw, :]
            if masks[dj] is not None:
                tap_u = jnp.where(masks[dj], tap_u, 0)
                tap_s = jnp.where(masks[dj], tap_s, 0)
            acc += jnp.dot(tap_u, wu_ref[t * c1p:(t + 1) * c1p, :],
                           preferred_element_type=jnp.float32)
            acc += jnp.dot(tap_s, wsk_ref[t * c2p:(t + 1) * c2p, :],
                           preferred_element_type=jnp.float32)
    out_ref[0] = (acc + b_ref[...].astype(jnp.float32)).astype(dtype)


def _bwd_data_kernel(dy_hbm, ww_ref, wu_ref, wsk_ref, dxh_ref, dsk_ref,
                     dy_slab, sem, *, th, w_in, w_out, c1p, c2p, sk_len,
                     dtype):
    """d_up = conv-transpose(dy) (flipped taps), then d_skip directly and
    d_xh through the W-resize transpose — dy is the only slab needed."""
    b = pl.program_id(0)
    rt = pl.program_id(1)
    thw = th * w_out
    cpg = pltpu.make_async_copy(
        dy_hbm.at[b, pl.ds(rt * thw, sk_len), :], dy_slab, sem)
    cpg.start()
    cpg.wait()
    masks = _wpos_masks(3, 1, thw, w_out)
    d_up = jnp.zeros((thw, c1p), jnp.float32)
    d_sk = jnp.zeros((thw, c2p), jnp.float32)
    for di in range(3):
        for dj in range(3):
            off = di * w_out + dj
            flip = (2 - di) * 3 + (2 - dj)
            tap_g = dy_slab[off:off + thw, :]
            if masks[dj] is not None:
                tap_g = jnp.where(masks[dj], tap_g, 0)
            d_up += jax.lax.dot_general(
                tap_g, wu_ref[flip * c1p:(flip + 1) * c1p, :],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            d_sk += jax.lax.dot_general(
                tap_g, wsk_ref[flip * c2p:(flip + 1) * c2p, :],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dsk_ref[0] = d_sk.astype(dtype)
    for r in range(th):
        rowg = d_up[r * w_out:(r + 1) * w_out, :].astype(dtype)
        dxh_row = jax.lax.dot_general(
            ww_ref[...], rowg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxh_ref[0, r * w_in:(r + 1) * w_in, :] = dxh_row.astype(dtype)


def _bwd_w_kernel(xh_hbm, sk_hbm, dy_hbm, ww_ref, dwu_ref, dwsk_ref,
                  xh_slab, sk_slab, dy_slab, up, sems, *, th, w_in, w_out,
                  c1p, c2p, xh_len, sk_len, dtype):
    """dW[t] = sum_o input_tap[o] * dy[o], accumulated across the whole grid
    in the VMEM-resident dW blocks (dw_conv's accumulation pattern); the up
    operand is recomputed in VMEM from the xh slab."""
    b = pl.program_id(0)
    rt = pl.program_id(1)
    thw = th * w_out
    cpx = pltpu.make_async_copy(
        xh_hbm.at[b, pl.ds(rt * th * w_in, xh_len), :], xh_slab, sems.at[0])
    cps = pltpu.make_async_copy(
        sk_hbm.at[b, pl.ds(rt * thw, sk_len), :], sk_slab, sems.at[1])
    cpg = pltpu.make_async_copy(
        dy_hbm.at[b, pl.ds(rt * thw, sk_len), :], dy_slab, sems.at[2])
    cpx.start()
    cps.start()
    cpg.start()

    @pl.when(jnp.logical_and(b == 0, rt == 0))
    def _init():
        dwu_ref[...] = jnp.zeros_like(dwu_ref)
        dwsk_ref[...] = jnp.zeros_like(dwsk_ref)

    cpx.wait()
    _resize_rows(ww_ref, xh_slab, up, th, w_in, w_out, dtype)
    cps.wait()
    cpg.wait()
    masks = _wpos_masks(3, 1, thw, w_out)
    dy_center = dy_slab[w_out + 1:w_out + 1 + thw, :]
    dwu_rows, dwsk_rows = [], []
    for di in range(3):
        for dj in range(3):
            off = di * w_out + dj
            tap_u = up[off:off + thw, :]
            tap_s = sk_slab[off:off + thw, :]
            if masks[dj] is not None:
                tap_u = jnp.where(masks[dj], tap_u, 0)
                tap_s = jnp.where(masks[dj], tap_s, 0)
            dwu_rows.append(jax.lax.dot_general(
                tap_u, dy_center, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dwsk_rows.append(jax.lax.dot_general(
                tap_s, dy_center, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    dwu_ref[...] += jnp.concatenate(dwu_rows, axis=0)
    dwsk_ref[...] += jnp.concatenate(dwsk_rows, axis=0)


def _pad_taps(kpart, cp, cop, dtype):
    """(3,3,C,Co) kernel slice -> (9*Cp, Cop) lane-padded tap rows."""
    c, co = kpart.shape[2], kpart.shape[3]
    kp = jnp.pad(kpart.astype(dtype),
                 ((0, 0), (0, 0), (0, cp - c), (0, 0)))
    return jnp.pad(kp.reshape(9 * cp, co), ((0, 0), (0, cop - co)))


def _prep(x, skip, kernel, mode):
    """Shared layout/shape computation; `mode` picks the tile size for the
    kernel being built ('fwd' | 'bwd_data' | 'bwd_w')."""
    b, h, w_in, c1 = x.shape
    _, ho, w_out, c2 = skip.shape
    co = kernel.shape[-1]
    dtype = x.dtype
    it = jnp.dtype(dtype).itemsize
    c1p, c2p, cop = _cp(c1), _cp(c2), _cp(co)
    th = _pick_th(ho, w_in, w_out, c1p, c2p, cop, it, mode)
    if th is None:
        raise ValueError(f"up_block kernel cannot tile {x.shape}->{skip.shape}")
    align = _sublane_align(it)
    xh_len = _round_align((th + 2) * w_in, align)
    sk_len = _round_align(th * w_out + 2 * w_out + 2, align)
    wh = _linear_weights_align_corners(h, ho)
    ww = jnp.asarray(_linear_weights_align_corners(w_in, w_out), dtype=dtype)
    wu = _pad_taps(kernel[:, :, :c1, :], c1p, cop, dtype)
    wsk = _pad_taps(kernel[:, :, c1:, :], c2p, cop, dtype)
    return (b, h, ho, w_in, w_out, c1, c2, co, c1p, c2p, cop, th, xh_len,
            sk_len, dtype, ww, wu, wsk, wh)


def _h_resize(x, wh, ho, dtype):
    """The outside H-axis contraction (production order: H then W)."""
    if x.shape[1] == ho:
        return x
    return jnp.einsum("oh,bhwc->bowc", jnp.asarray(wh, jnp.float32),
                      x.astype(jnp.float32)).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def up_concat_conv(x, skip, kernel, bias, interpret=False):
    """conv3x3-SAME(concat([resize_align_corners(x, skip.HW), skip], -1))
    with bias — the UpSampleBN conv_a stage fused into one kernel.
    x (B,h,w,C1), skip (B,H,W,C2), kernel (3,3,C1+C2,Co) HWIO, bias (Co,).
    Returns (B,H,W,Co) in x.dtype with f32 accumulation."""
    out, _ = _up_fwd(x, skip, kernel, bias, interpret)
    return out


def _up_fwd(x, skip, kernel, bias, interpret):
    interpret = interpret or FORCE_INTERPRET
    (b, h, ho, w_in, w_out, c1, c2, co, c1p, c2p, cop, th, xh_len, sk_len,
     dtype, ww, wu, wsk, wh) = _prep(x, skip, kernel, "fwd")
    thw = th * w_out
    xh = _h_resize(x, wh, ho, dtype)
    xh_flat = _flat_hpad(xh, xh_len - (th + 2) * w_in, c1p)
    sk_flat = _flatten_padded(skip.astype(dtype), 1,
                              sk_len - (thw + 2 * w_out + 2), c2p)
    bias_row = jnp.pad(bias.astype(jnp.float32), (0, cop - co)).reshape(1, cop)
    body = functools.partial(
        _fwd_kernel, th=th, w_in=w_in, w_out=w_out, c1p=c1p, c2p=c2p,
        xh_len=xh_len, sk_len=sk_len, dtype=dtype)
    it = jnp.dtype(dtype).itemsize
    out = pl.pallas_call(
        body,
        grid=(b, ho // th),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * w_out * (c1 + c2) * co * 9
                  + 2 * b * (ho + 2) * w_out * w_in * c1,
            bytes_accessed=(b * (ho + 2) * w_in * c1p
                            + b * ho * w_out * (c2p + cop)) * it,
            transcendentals=0),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((w_out, w_in), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c1p, cop), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c2p, cop), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cop), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, thw, cop), lambda bb, rr: (bb, rr, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho * w_out, cop), dtype),
        scratch_shapes=[
            pltpu.VMEM((xh_len, c1p), dtype),
            pltpu.VMEM((sk_len, c2p), dtype),
            pltpu.VMEM(((th + 2) * w_out + 2, c1p), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xh_flat, sk_flat, ww, wu, wsk, bias_row)
    out = out[..., :co].reshape(b, ho, w_out, co)
    return out, (x, skip, kernel, xh)


def _up_bwd(interpret, residuals, g):
    interpret = interpret or FORCE_INTERPRET
    x, skip, kernel, xh = residuals
    it = jnp.dtype(x.dtype).itemsize

    # --- data gradients (d_xh, d_skip): only the dy slab in VMEM ---------
    (b, h, ho, w_in, w_out, c1, c2, co, c1p, c2p, cop, th, xh_len, sk_len,
     dtype, ww, wu, wsk, wh) = _prep(x, skip, kernel, "bwd_data")
    thw = th * w_out
    g = g.astype(dtype)
    dy_flat = _flatten_padded(g, 1, sk_len - (thw + 2 * w_out + 2), cop)
    body = functools.partial(
        _bwd_data_kernel, th=th, w_in=w_in, w_out=w_out, c1p=c1p, c2p=c2p,
        sk_len=sk_len, dtype=dtype)
    dxh, dsk = pl.pallas_call(
        body,
        grid=(b, ho // th),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * w_out * (c1 + c2) * co * 9
                  + 2 * b * ho * w_out * w_in * c1,
            bytes_accessed=b * ho * (w_out * (cop + c2p) + w_in * c1p) * it,
            transcendentals=0),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((w_out, w_in), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c1p, cop), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c2p, cop), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th * w_in, c1p), lambda bb, rr: (bb, rr, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, thw, c2p), lambda bb, rr: (bb, rr, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ho * w_in, c1p), dtype),
            jax.ShapeDtypeStruct((b, ho * w_out, c2p), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((sk_len, cop), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dy_flat, ww, wu, wsk)

    # --- weight gradients (dW): xh + skip + dy slabs, dW VMEM-resident ---
    (_, _, _, _, _, _, _, _, _, _, _, th2, xh_len2, sk_len2,
     _, _, _, _, _) = _prep(x, skip, kernel, "bwd_w")
    thw2 = th2 * w_out
    xh_flat = _flat_hpad(xh, xh_len2 - (th2 + 2) * w_in, c1p)
    tail2 = sk_len2 - (thw2 + 2 * w_out + 2)
    sk_flat = _flatten_padded(skip.astype(dtype), 1, tail2, c2p)
    dy_flat2 = _flatten_padded(g, 1, tail2, cop)
    body_w = functools.partial(
        _bwd_w_kernel, th=th2, w_in=w_in, w_out=w_out, c1p=c1p, c2p=c2p,
        xh_len=xh_len2, sk_len=sk_len2, dtype=dtype)
    dwu, dwsk = pl.pallas_call(
        body_w,
        grid=(b, ho // th2),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * w_out * (c1 + c2) * co * 9
                  + 2 * b * (ho + 2) * w_out * w_in * c1,
            bytes_accessed=(b * (ho + 2) * w_in * c1p
                            + b * ho * w_out * (c2p + cop)) * it,
            transcendentals=0),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((w_out, w_in), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9 * c1p, cop), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c2p, cop), lambda bb, rr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9 * c1p, cop), jnp.float32),
            jax.ShapeDtypeStruct((9 * c2p, cop), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((xh_len2, c1p), dtype),
            pltpu.VMEM((sk_len2, c2p), dtype),
            pltpu.VMEM((sk_len2, cop), dtype),
            pltpu.VMEM(((th2 + 2) * w_out + 2, c1p), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xh_flat, sk_flat, dy_flat2, ww)
    d_xh = dxh[..., :c1].reshape(b, ho, w_in, c1)
    if h == ho:
        dx = d_xh
    else:
        dx = jnp.einsum("oh,bowc->bhwc", jnp.asarray(wh, jnp.float32),
                        d_xh.astype(jnp.float32)).astype(x.dtype)
    d_skip = dsk[..., :c2].reshape(b, ho, w_out, c2).astype(skip.dtype)
    dk_up = dwu.reshape(3, 3, c1p, cop)[:, :, :c1, :co]
    dk_sk = dwsk.reshape(3, 3, c2p, cop)[:, :, :c2, :co]
    dkernel = jnp.concatenate([dk_up, dk_sk], axis=2).astype(kernel.dtype)
    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, d_skip, dkernel, dbias


up_concat_conv.defvjp(_up_fwd, _up_bwd)
