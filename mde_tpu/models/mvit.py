"""miniViT adaptive-bins head (reference models/miniViT.py, models/layers.py).

A 16x16 conv patch embedding + learned positional table (<=500 tokens) feeds a
4-layer post-norm transformer encoder matching torch's nn.TransformerEncoderLayer
semantics (d_model=128, 4 heads, FFN 1024, ReLU, dropout 0.1, LayerNorm after
each residual). Token 0 regresses normalized bin widths through a 128->256->256->
n_bins MLP; tokens 1..128 act as queries dotted against a 3x3-conv projection of
the decoder map to produce 128 range-attention maps
(reference miniViT.py:23-45, layers.py:16-36).

Attention runs as batched MXU matmuls in bf16 with f32 softmax; at the
reference's training resolution there are only ~221 tokens, so a flash-style
Pallas kernel buys nothing here — fusion is left to XLA (see kernels/ for the
ops where Pallas does pay).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class TorchMultiheadAttention(nn.Module):
    """nn.MultiheadAttention-compatible self-attention (packed qkv projection)."""
    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (N, S, E)
        n, s, e = x.shape
        h = self.num_heads
        hd = e // h
        qkv = nn.Dense(3 * e, name="in_proj", dtype=self.dtype)(x)       # (N,S,3E)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(n, s, h, hd).transpose(0, 2, 1, 3)          # (N,H,S,hd)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(hd)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        weights = nn.Dropout(self.dropout_rate, deterministic=deterministic)(weights)
        out = jnp.einsum("nhqk,nhkd->nhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, s, e)
        return nn.Dense(e, name="out_proj", dtype=self.dtype)(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm torch-style encoder layer: x = LN(x + Drop(SA(x)));
    x = LN(x + Drop(FFN(x)))."""
    embed_dim: int
    num_heads: int
    ff_dim: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = TorchMultiheadAttention(self.embed_dim, self.num_heads,
                                       self.dropout_rate, self.dtype,
                                       name="self_attn")(x, deterministic)
        attn = nn.Dropout(self.dropout_rate, deterministic=deterministic)(attn)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + attn).astype(self.dtype)

        y = nn.Dense(self.ff_dim, name="linear1", dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        y = nn.Dense(self.embed_dim, name="linear2", dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + y).astype(self.dtype)
        return x


class PatchEmbed(nn.Module):
    """Non-overlapping PxP stride-P conv patch embedding, computed as
    extract-patches + one MXU matmul instead of lax.conv.

    Mathematically identical to nn.Conv(E, (P, P), strides=P, padding='VALID')
    and keeps the exact conv param layout (kernel (P, P, C, E), bias (E,)) so
    checkpoint converters and parity tests are unchanged. The point is the
    *backward*: XLA lowers the input-gradient of a stride-P conv as a dense
    PxP convolution over the interior-dilated cotangent — ~P^2 x the forward
    FLOPs of almost-all-zero math (measured 152 ms of the 253 ms flagship
    train step at P=16, scripts/probe_decoder_bisect.py 2026-08-17). As a
    matmul, the backward is two matmuls of the forward's size."""
    features: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        n, h, w, c = x.shape
        hp, wp = h // p, w // p
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        x = x[:, :hp * p, :wp * p, :]                  # VALID: drop remainder
        patches = x.reshape(n, hp, p, wp, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(n, hp * wp, p * p * c)
        w_mat = kernel.astype(self.dtype).reshape(p * p * c, self.features)
        y = patches @ w_mat + bias.astype(self.dtype)
        return y                                       # (N, Hp*Wp, E)


class PatchTransformerEncoder(nn.Module):
    """16x16 conv patch embed + positional table + 4 transformer layers
    (reference layers.py:5-24). Returns (N, S, E)."""
    embedding_dim: int = 128
    patch_size: int = 16
    num_heads: int = 4
    num_layers: int = 4
    max_tokens: int = 500
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = PatchEmbed(self.embedding_dim, self.patch_size, self.dtype,
                       name="embedding_convPxP")(x)                       # (N, S, E)
        pos = self.param("positional_encodings",
                         nn.initializers.uniform(scale=1.0),
                         (self.max_tokens, self.embedding_dim), jnp.float32)
        y = y + pos[:y.shape[1], :].astype(self.dtype)[None]
        for i in range(self.num_layers):
            y = TransformerEncoderLayer(self.embedding_dim, self.num_heads, 1024,
                                        dtype=self.dtype, name=f"layer_{i}")(y, deterministic)
        return y


def pixelwise_dot_product(x_nhwc, queries_nqc):
    """(N,H,W,C) x (N,Q,C) -> (N,H,W,Q) range-attention maps
    (reference layers.py:27-36). One batched matmul on the MXU."""
    return jnp.einsum("nhwc,nqc->nhwq", x_nhwc, queries_nqc)


class MViT(nn.Module):
    """Adaptive-bins head (reference miniViT.py:7-45)."""
    n_query_channels: int = 128
    patch_size: int = 16
    dim_out: int = 256
    embedding_dim: int = 128
    num_heads: int = 4
    norm: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        tgt = PatchTransformerEncoder(self.embedding_dim, self.patch_size,
                                      self.num_heads, dtype=self.dtype,
                                      name="patch_transformer")(x, deterministic)

        proj = nn.Conv(self.embedding_dim, (3, 3), padding=1, name="conv3x3",
                       dtype=self.dtype)(x)

        regression_head = tgt[:, 0, :]                                   # (N, E)
        queries = tgt[:, 1:self.n_query_channels + 1, :]                 # (N, Q, E)
        range_attention_maps = pixelwise_dot_product(proj, queries)      # (N,H,W,Q)

        y = nn.Dense(256, name="regressor_0", dtype=self.dtype)(regression_head)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Dense(256, name="regressor_1", dtype=self.dtype)(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Dense(self.dim_out, name="regressor_2", dtype=self.dtype)(y)
        y = y.astype(jnp.float32)

        if self.norm == "linear":
            y = nn.relu(y) + 0.1
            y = y / jnp.sum(y, axis=1, keepdims=True)
        elif self.norm == "softmax":
            y = nn.softmax(y, axis=1)
        else:  # sigmoid
            y = nn.sigmoid(y)
            y = y / jnp.sum(y, axis=1, keepdims=True)
        return y, range_attention_maps
