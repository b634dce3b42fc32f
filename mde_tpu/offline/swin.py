"""Swin-B backbone (flax, NHWC) — the instance-cue detector trunk.

Behavioral re-derivation of the mmdet-fork Swin used by the reference
(Swin-Transformer-Object-Detection/mmdet/models/backbones/swin_transformer.py:
41-630) with the ade20k config (embed 128, depths [2,2,18,2], heads
[4,8,16,32], window 7, patch_norm, ape=False — configs/swin/cascade_…ade20k.py:10-19):

  patch embed 4x4 conv -> LN; 4 stages of [W-MSA | SW-MSA] pairs with relative
  position bias; patch merging (2x2 concat + LN + linear) between stages;
  per-out-index LayerNorm; NCHW-free — everything stays (N, H, W, C) and
  window partitioning is reshape/transpose only, which XLA lowers to cheap
  layout ops.

Inference-only (drop-path/dropout inert); used by the offline cue pipeline.
Window attention over 49-token windows is batched as one big MXU matmul per
block — at 1333x800 there are ~5k windows, so heads x windows batch the MXU
well without a custom kernel.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x, ws: int):
    """(N, H, W, C) -> (N*nH*nW, ws, ws, C); H, W divisible by ws."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    """(N*nH*nW, ws, ws, C) -> (N, H, W, C)."""
    c = windows.shape[-1]
    n = windows.shape[0] // (h // ws * w // ws)
    x = windows.reshape(n, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2*ws-1)^2 relative-position-bias table
    (swin_transformer.py:82-93)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shift_attention_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, ws*ws, ws*ws) additive mask (0 / -100) for SW-MSA
    (swin_transformer.py:221-239)."""
    img_mask = np.zeros((hp, wp))
    cnt = 0
    for h_sl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w_sl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[h_sl, w_sl] = cnt
            cnt += 1
    mw = img_mask.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_windows, attn_mask=None):
        """x_windows: (B, T, C) with T = ws*ws; attn_mask: (nW, T, T) or None
        (B = batch * num_windows)."""
        b, t, c = x_windows.shape
        h = self.num_heads
        hd = c // h
        ws = self.window_size

        qkv = nn.Dense(3 * c, name="qkv", dtype=self.dtype)(x_windows)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, h, hd).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]                       # (B, H, T, hd)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, h), jnp.float32)
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias = jnp.take(table, idx, axis=0).reshape(t, t, h).transpose(2, 0, 1)
        logits = logits + bias[None].astype(logits.dtype)

        if attn_mask is not None:
            nw = attn_mask.shape[0]
            logits = logits.reshape(b // nw, nw, h, t, t) + \
                attn_mask[None, :, None].astype(logits.dtype)
            logits = logits.reshape(b, h, t, t)

        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return nn.Dense(c, name="proj", dtype=self.dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, C) already padded to window multiples upstream? No —
        pads here per block (swin_transformer.py:175-183)."""
        n, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_attention_mask(hp, wp, ws, self.shift))
        else:
            mask = None

        windows = window_partition(y, ws).reshape(-1, ws * ws, c)
        attn = WindowAttention(self.dim, self.num_heads, ws, self.dtype,
                               name="attn")(windows, mask)
        y = window_reverse(attn.reshape(-1, ws, ws, c), ws, hp, wp)

        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :h, :w]

        x = shortcut + y
        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        z = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1", dtype=self.dtype)(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, name="mlp_fc2", dtype=self.dtype)(z)
        return x + z


class PatchMerging(nn.Module):
    """2x2 spatial concat + LN + linear 4C->2C (swin_transformer.py:244-270)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            h, w = x.shape[1], x.shape[2]
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y).astype(self.dtype)
        return nn.Dense(2 * c, use_bias=False, name="reduction", dtype=self.dtype)(y)


class SwinTransformer(nn.Module):
    """Swin-B trunk -> 4 NHWC feature maps at strides 4/8/16/32."""
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 7
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    use_checkpoint: bool = False   # remat each block (reference trains the
    # detector with use_checkpoint=True, swin_transformer.py:393)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_cls = nn.remat(SwinBlock) if self.use_checkpoint else SwinBlock
        # patch embed: 4x4 stride-4 conv + LN (patch_norm=True)
        h_in, w_in = x.shape[1:3]
        pad_b = (4 - h_in % 4) % 4
        pad_r = (4 - w_in % 4) % 4
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        # As in models/mvit.py::PatchEmbed: extract-patches + matmul instead
        # of lax.conv, because XLA lowers a stride-P conv's input-gradient as
        # a dense dilated conv (~P^2 x forward FLOPs) — 16x backward overhead
        # here when training the detector. Same param layout as nn.Conv.
        from ..models.mvit import PatchEmbed
        y = PatchEmbed(self.embed_dim, 4, self.dtype,
                       name="patch_embed_proj")(x.astype(self.dtype))
        y = y.reshape(x.shape[0], x.shape[1] // 4, x.shape[2] // 4,
                      self.embed_dim)
        y = nn.LayerNorm(dtype=jnp.float32, name="patch_embed_norm")(y).astype(self.dtype)

        outs = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else self.window_size // 2
                y = block_cls(dim, self.num_heads[stage], self.window_size,
                              shift, dtype=self.dtype,
                              name=f"stage{stage}_block{blk}")(y)
            if stage in self.out_indices:
                o = nn.LayerNorm(dtype=jnp.float32, name=f"out_norm{stage}")(y)
                outs.append(o.astype(self.dtype))
            if stage < len(self.depths) - 1:
                y = PatchMerging(self.dtype, name=f"downsample{stage}")(y)
                dim *= 2
        return outs
