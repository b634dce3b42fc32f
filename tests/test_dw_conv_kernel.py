"""Pallas depthwise-conv kernel (kernels/dw_conv.py) value + gradient parity
against the lax grouped conv it replaces, in interpret mode on CPU. Covers
k=3 and k=5, channel counts that are NOT lane multiples, widths that force
the W-edge masks, H values whose only fitting tile is TH=1, and the
encoder-module routing (dw_impl='pallas' matches dw_impl='conv')."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mde_tpu.kernels.dw_conv as dw_mod
from mde_tpu.kernels.dw_conv import dw_conv2d_pallas


def _ref_dw(x, kernel):
    """lax grouped conv, TF-SAME, stride 1 — the dw_impl='conv' lowering."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        preferred_element_type=jnp.float32).astype(x.dtype)


def _setup(seed, b, h, w, c, k, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32), dtype)
    kern = jnp.asarray(
        rng.standard_normal((k, k, 1, c), dtype=np.float32) * 0.3, dtype)
    return x, kern


@pytest.mark.parametrize("shape,k", [
    ((2, 8, 12, 16), 3),       # small, even dims
    ((1, 7, 9, 5), 3),         # odd W (edge masks), odd C, TH=7 or 1
    ((2, 6, 10, 130), 3),      # C just past one lane tile
    ((1, 8, 8, 8), 5),         # k=5, two-col halo
    ((1, 5, 7, 3), 5),         # prime H -> TH in {5, 1}
])
def test_dw_pallas_value_matches_lax(shape, k):
    x, kern = _setup(0, *shape, k)
    ref = _ref_dw(x, kern)
    got = dw_conv2d_pallas(x, kern, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dw_pallas_value_bf16():
    x, kern = _setup(1, 2, 8, 12, 24, 3, jnp.bfloat16)
    ref = _ref_dw(x, kern).astype(jnp.float32)
    got = dw_conv2d_pallas(x, kern, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape,k", [((2, 8, 12, 16), 3), ((1, 8, 8, 8), 5)])
def test_dw_pallas_gradients_match_lax(shape, k):
    x, kern = _setup(2, *shape, k)
    tgt = jnp.asarray(
        np.random.default_rng(3).standard_normal(x.shape, dtype=np.float32))

    def loss_ref(x, kern):
        return jnp.mean((_ref_dw(x, kern).astype(jnp.float32) - tgt) ** 2)

    def loss_got(x, kern):
        out = dw_conv2d_pallas(x, kern, True).astype(jnp.float32)
        return jnp.mean((out - tgt) ** 2)

    gref = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    ggot = jax.grad(loss_got, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(ggot[0]), np.asarray(gref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ggot[1]), np.asarray(gref[1]),
                               rtol=1e-4, atol=1e-5)


def test_dw_pallas_gradcheck_numeric():
    x, kern = _setup(4, 1, 4, 6, 3, 3)
    f = lambda kk: jnp.sum(dw_conv2d_pallas(x, kk, True) ** 2)
    g = np.asarray(jax.grad(f)(kern))
    eps = 1e-3
    k0 = np.asarray(kern)
    for idx in [(0, 0, 0, 0), (1, 1, 0, 1), (2, 0, 0, 2)]:
        kp = k0.copy(); kp[idx] += eps
        km = k0.copy(); km[idx] -= eps
        num = (float(f(jnp.asarray(kp))) - float(f(jnp.asarray(km)))) / (2 * eps)
        assert abs(num - g[idx]) < 5e-3, (idx, num, g[idx])


def test_encoder_dw_impl_pallas_matches_conv(monkeypatch):
    """The full encoder with dw_impl='pallas' reproduces dw_impl='conv'
    (stride-2 sites fall back to the lax path inside _dw_conv)."""
    monkeypatch.setattr(dw_mod, "FORCE_INTERPRET", True)
    from mde_tpu.models.efficientnet import EfficientNetEncoder

    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 64, 64, 3), dtype=np.float32))
    enc_conv = EfficientNetEncoder(arch="efficientnet-b1", dw_impl="conv")
    enc_pal = EfficientNetEncoder(arch="efficientnet-b1", dw_impl="pallas")
    variables = enc_conv.init({"params": jax.random.PRNGKey(0)}, x, False)
    ref = enc_conv.apply(variables, x, False)
    got = enc_pal.apply(variables, x, False)  # identical param tree
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_resolve_dw_impl_gating(monkeypatch):
    """'pallas' falls back to 'conv' on CPU unless tests force interpret."""
    import types
    from mde_tpu.models.unet_adaptive_bins import _resolve_dw_impl

    args = types.SimpleNamespace(dw_impl="pallas")
    monkeypatch.setattr(dw_mod, "FORCE_INTERPRET", False)
    assert _resolve_dw_impl(args, None) == "conv"
    monkeypatch.setattr(dw_mod, "FORCE_INTERPRET", True)
    assert _resolve_dw_impl(args, None) == "pallas"
    args.dw_impl = "shifts"
    assert _resolve_dw_impl(args, None) == "shifts"
