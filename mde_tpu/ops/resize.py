"""Spatial resize ops with exact torch interpolation semantics, TPU-first.

The reference leans on `F.interpolate(..., mode='bilinear', align_corners=True)`
in the decoder upsample (reference models/unet_adaptive_bins.py:51), the loss
(loss.py:14), validation/eval resizes (train.py:543, evaluate.py:61, infer.py:117)
and `mode='nearest'` for cue downsampling (unet_adaptive_bins.py:247,264,268).

`jax.image.resize` implements neither torch's align_corners=True bilinear nor
torch's legacy 'nearest'. Instead of a gather-heavy port we express separable
interpolation as two small dense matmuls:

    out[b, :, :, c] = W_h @ img[b, :, :, c] @ W_w^T

which XLA maps straight onto the MXU — on TPU this is faster than gathers for
the dense weights involved, and it is exactly equal to torch's kernel
arithmetic (each output pixel is the same convex combination of inputs).
Weight matrices depend only on static shapes, so they are constants folded at
trace time.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _linear_weights_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic (out_size, in_size) bilinear weights, align_corners=True."""
    if in_size == 1 or out_size == 1:
        # torch maps everything to source index 0 when out_size==1 under
        # align_corners; when in_size==1 every output copies the single input.
        w = np.zeros((out_size, in_size), dtype=np.float32)
        w[:, 0] = 1.0
        return w
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = src - lo
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    w[rows, lo] = 1.0 - frac
    w[rows, lo + 1] = frac
    return w.astype(np.float32)


@functools.lru_cache(maxsize=128)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch 'nearest' (legacy, floor) source index per output position."""
    return np.minimum(
        (np.arange(out_size, dtype=np.float64) * (in_size / out_size)).astype(np.int64),
        in_size - 1,
    )


def _extract_2x_taps(wmat: np.ndarray):
    """For an exact-2x upsample whose 2-tap pattern is stationary with
    period 2 — even output row 2m reads input rows (m-1, m), odd row 2m+1
    reads (m, m+1) — return the per-row first-tap weights (w_even, w_odd),
    else None.

    Both torch conventions have this structure at out == 2*in:
    align_corners=True (lo(2m) = m-1 for m>=1, lo(2m+1) = m) and
    half-pixel (src = m -/+ 0.25). Edges rely on w_even[0] == 0 and
    w_odd[-1] == 1 so the out-of-range tap carries zero weight; verified
    here rather than assumed.
    """
    out_size, in_size = wmat.shape
    if out_size != 2 * in_size or in_size < 2:
        return None
    m = np.arange(in_size)
    w_even = np.where(m >= 1, wmat[2 * m, np.maximum(m - 1, 0)], 0.0)
    w_odd = wmat[2 * m + 1, m]
    check = np.zeros_like(wmat)
    check[2 * m, np.maximum(m - 1, 0)] += w_even
    check[2 * m, m] += 1.0 - w_even
    check[2 * m + 1, m] += w_odd
    check[2 * m + 1, np.minimum(m + 1, in_size - 1)] += 1.0 - w_odd
    if not np.allclose(check, wmat, atol=1e-6):
        return None  # pragma: no cover - defensive; both conventions match
    return (w_even.astype(np.float32), w_odd.astype(np.float32))


def _upsample2x_axis(y: jnp.ndarray, axis: int, taps) -> jnp.ndarray:
    """Stationary 2-tap 2x upsample along `axis` via shifted FMAs + an
    interleaving reshape — pure VPU work, no MXU matmul. `y` is f32."""
    w_even, w_odd = taps
    n = y.shape[axis]
    shape = [1] * y.ndim
    shape[axis] = n
    we = jnp.asarray(w_even).reshape(shape)
    wo = jnp.asarray(w_odd).reshape(shape)
    prev_sl = [slice(None)] * y.ndim
    prev_sl[axis] = slice(0, 1)
    head = y[tuple(prev_sl)]
    prev_sl[axis] = slice(0, n - 1)
    y_prev = jnp.concatenate([head, y[tuple(prev_sl)]], axis=axis)
    next_sl = [slice(None)] * y.ndim
    next_sl[axis] = slice(1, n)
    tail_sl = [slice(None)] * y.ndim
    tail_sl[axis] = slice(n - 1, n)
    y_next = jnp.concatenate([y[tuple(next_sl)], y[tuple(tail_sl)]], axis=axis)
    even = we * y_prev + (1.0 - we) * y
    odd = wo * y + (1.0 - wo) * y_next
    out = jnp.stack([even, odd], axis=axis + 1)
    out_shape = list(y.shape)
    out_shape[axis] = 2 * n
    return out.reshape(out_shape)


# bf16 inputs: contract directly in bf16 with f32 accumulation via ONE
# 3-operand einsum ('oh,pw,bhwc->bopc' — XLA picks the dot order) instead
# of casting the input to f32 first. Standalone A/B at the decoder's four
# upsample shapes (probe_resize_impls.py 2026-08-19, stamps 107-108):
# f32cast 5.08/6.02 ms fwd / fwd+bwd vs bf16_one 4.42/5.53 — the f32 cast
# materializes 2x the HBM bytes for arithmetic DEFAULT precision was going
# to truncate to bf16 anyway. Same MXU math up to bf16 rounding of the
# interpolation coefficients (measured 0.7% max rel vs the f32cast form).
#
# IN-STEP verdict (probe_step_perf rszf_* 2026-08-19 evening, stamps
# 107.8/103.6): the fused form LOSES end-to-end at BOTH operating points —
# bs16 117.33 ms vs 113.41 off, bs32 230.12 vs 225.28. The
# standalone win doesn't survive in-step: XLA already fuses the f32 cast
# into the producing op's epilogue inside the full program, so the 2x HBM
# materialization the standalone microbench pays never happens there, while
# the 3-operand einsum constrains the fusion choices around the resize.
# Default stays OFF; f32 parity paths untouched. Same lesson as the
# interleave-2x and pw_impl experiments below: standalone resize microbench
# wins at these sizes do not transfer — only in-step A/Bs decide.
RESIZE_BF16_FUSED = False

# Measured verdict (2026-08-18, stamps 110-112 TFLOP/s): the interleave
# form LOSES 24-28% end-to-end at the flagship operating points
# (probe_step_perf noilv_bs16 125.9 ms vs both_bs16 156.6; bs32 237.3 vs
# 303.4). Saving the 2-tap matmul FLOPs doesn't pay for the stack+reshape
# relayout the VPU form needs — the MXU resize is effectively free next to
# it. Kept OFF; flip for re-A/B only (tests exercise the path directly).
INTERLEAVE_2X = False


def _try_upsample2x(x, out_h, out_w, weight_builder):
    """Exact-2x bf16 upsample as stationary 2-tap shifted FMAs + an
    interleaving reshape (~4 VPU FLOPs/output element vs the dense
    separable matmul's ~545 GFLOP/step of 2-tap MXU work at the flagship
    shape). A take-based gather form loses 14x (probe_pw_resize.py), and
    THIS form loses 24-28% in-step (see INTERLEAVE_2X above) — the dense
    matmul stays the production lowering; this path is the documented
    experiment. bf16-only: f32 parity paths keep the HIGHEST-precision
    matmuls that reference parity was proven with.
    """
    h, w = x.shape[-3], x.shape[-2]
    if not INTERLEAVE_2X:
        return None
    if x.dtype != jnp.bfloat16 or out_h != 2 * h or out_w != 2 * w:
        return None
    taps_h = _extract_2x_taps(weight_builder(h, out_h))
    taps_w = _extract_2x_taps(weight_builder(w, out_w))
    if taps_h is None or taps_w is None:  # pragma: no cover - defensive
        return None
    y = _upsample2x_axis(x.astype(jnp.float32), x.ndim - 3, taps_h)
    y = _upsample2x_axis(y, x.ndim - 2, taps_w)
    return y.astype(x.dtype)


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear align_corners=True resize of NHWC (or HWC / NCHW-agnostic axes).

    Args:
        x: (..., H, W, C) array; the two axes before the last are resized.
        out_hw: (out_h, out_w).
    Returns:
        (..., out_h, out_w, C) array, same dtype as x for floating inputs.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    fast2x = _try_upsample2x(x, out_h, out_w, _linear_weights_align_corners)
    if fast2x is not None:
        return fast2x
    dtype = x.dtype
    if dtype == jnp.bfloat16 and RESIZE_BF16_FUSED:
        return _fused_bf16_resize(x, out_h, out_w, _linear_weights_align_corners)
    wh = jnp.asarray(_linear_weights_align_corners(h, out_h), dtype=jnp.float32)
    ww = jnp.asarray(_linear_weights_align_corners(w, out_w), dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    # (..., H, W, C): contract H with wh then W with ww via einsum → two
    # matmuls. For f32 inputs (eval resizes, loss interpolation, parity
    # paths) HIGHEST precision keeps full-f32 MXU arithmetic so results match
    # the reference bit-for-bit to fp32 rounding. For bf16 inputs (the
    # decoder's in-model upsamples under the bf16 training policy) the
    # operands carry bf16 information anyway, so DEFAULT precision — one MXU
    # pass instead of HIGHEST's six, f32 accumulation either way — is the
    # right speed/accuracy point (~8 ms/step at the flagship shape).
    prec = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    y = _separable_matmuls(wh, ww, xf, prec)
    return y.astype(dtype)


def _fused_bf16_resize(x, out_h, out_w, weight_builder):
    """Both separable contractions in bf16 with f32 accumulation, no f32
    input materialization (see RESIZE_BF16_FUSED above). C==1 inputs keep
    the squeezed (H, W)-on-the-MXU layout of _separable_matmuls."""
    h, w = x.shape[-3], x.shape[-2]
    wh = jnp.asarray(weight_builder(h, out_h), dtype=jnp.bfloat16)
    ww = jnp.asarray(weight_builder(w, out_w), dtype=jnp.bfloat16)
    if x.shape[-1] == 1:
        y = jnp.einsum('oh,pw,...hw->...op', wh, ww, x[..., 0],
                       preferred_element_type=jnp.float32)
        return y[..., None].astype(x.dtype)
    y = jnp.einsum('oh,pw,...hwc->...opc', wh, ww, x,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _separable_matmuls(wh, ww, xf, prec):
    """Apply the two separable resize matmuls, shaped for the MXU.

    For C==1 (depth maps: the SILog train-loss interpolation and the eval /
    TTA resizes) the generic einsum leaves the size-1 channel on the 128-wide
    lane axis — 1/128 MXU utilization on both contractions. Squeeze it and
    contract over (H, W) directly instead; identical arithmetic (same
    contraction, same precision), just a usable layout.
    """
    if xf.shape[-1] == 1:
        xsq = xf[..., 0]                                        # (..., H, W)
        y = jnp.einsum('oh,...hw->...ow', wh, xsq, precision=prec)
        y = jnp.einsum('pw,...ow->...op', ww, y, precision=prec)
        return y[..., None]
    y = jnp.einsum('oh,...hwc->...owc', wh, xf, precision=prec)
    return jnp.einsum('pw,...owc->...opc', ww, y, precision=prec)


@functools.lru_cache(maxsize=128)
def _linear_weights_half_pixel(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear weights, torch align_corners=False
    (half-pixel centers, edge-clamped)."""
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, max(in_size - 2, 0))
    frac = np.clip(src - lo, 0.0, 1.0)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    w[rows, lo] = 1.0 - frac
    w[rows, np.minimum(lo + 1, in_size - 1)] += frac
    return w.astype(np.float32)


def resize_bilinear_half_pixel(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear align_corners=False resize of (..., H, W, C) — the HRNet /
    mmdetection interpolation convention."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    fast2x = _try_upsample2x(x, out_h, out_w, _linear_weights_half_pixel)
    if fast2x is not None:
        return fast2x
    dtype = x.dtype
    if dtype == jnp.bfloat16 and RESIZE_BF16_FUSED:
        return _fused_bf16_resize(x, out_h, out_w, _linear_weights_half_pixel)
    wh = jnp.asarray(_linear_weights_half_pixel(h, out_h))
    ww = jnp.asarray(_linear_weights_half_pixel(w, out_w))
    xf = x.astype(jnp.float32)
    # same precision + layout policy as resize_bilinear_align_corners above
    prec = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    y = _separable_matmuls(wh, ww, xf, prec)
    return y.astype(dtype)


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch mode='nearest' resize of (..., H, W, C)."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    ih = jnp.asarray(_nearest_indices(h, out_h))
    iw = jnp.asarray(_nearest_indices(w, out_w))
    y = jnp.take(x, ih, axis=-3)
    y = jnp.take(y, iw, axis=-2)
    return y
