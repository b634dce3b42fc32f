"""Fused decoder up-block kernel (kernels/up_block.py) value + gradient
parity against the native composition it replaces
(resize_bilinear_align_corners -> concat -> lax conv3x3 SAME + bias), in
interpret mode on CPU. Covers non-2x resize ratios (the conv2 padding quirk
makes up1's ratio 15->26), channel counts that are not lane multiples,
single-tile fallbacks, f32 and bf16, and the decoder-module routing
(up_impl='fused' shares the param tree with 'native')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mde_tpu.kernels.up_block as up_mod
from mde_tpu.kernels.up_block import up_concat_conv, up_supported
from mde_tpu.ops.resize import resize_bilinear_align_corners


def _ref(x, skip, kernel, bias):
    up = resize_bilinear_align_corners(x, skip.shape[-3:-1])
    f = jnp.concatenate([up, skip], axis=-1)
    y = jax.lax.conv_general_dilated(
        f, kernel.astype(f.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def _setup(seed, bx, h, w, c1, ho, wo, c2, co, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((bx, h, w, c1), dtype=np.float32), dtype)
    skip = jnp.asarray(rng.standard_normal((bx, ho, wo, c2),
                                           dtype=np.float32), dtype)
    kern = jnp.asarray(rng.standard_normal((3, 3, c1 + c2, co),
                                           dtype=np.float32) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(co, dtype=np.float32) * 0.1,
                       jnp.float32)
    return x, skip, kern, bias


CASES = [
    (2, 5, 7, 10, 10, 14, 6, 9),      # 2x, odd low-res dims, odd channels
    (1, 4, 5, 3, 9, 11, 4, 5),        # non-integer ratios (the up1 regime)
    (1, 8, 16, 130, 16, 32, 16, 8),   # C1 just past one lane tile
    (2, 6, 8, 8, 6, 8, 5, 7),         # no H resize (h == ho), W resize only
    (1, 3, 4, 4, 3, 4, 2, 3),         # no resize at all (degenerate)
]


@pytest.mark.parametrize("case", CASES)
def test_up_block_value_matches_native(case):
    x, skip, kern, bias = _setup(0, *case)
    assert up_supported(x.shape, skip.shape, kern.shape[-1], x.dtype)
    ref = _ref(x, skip, kern, bias)
    got = up_concat_conv(x, skip, kern, bias, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_up_block_value_bf16():
    x, skip, kern, bias = _setup(1, 2, 5, 7, 10, 10, 14, 6, 9, jnp.bfloat16)
    ref = _ref(x, skip, kern, bias).astype(jnp.float32)
    got = up_concat_conv(x, skip, kern, bias, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("case", [CASES[0], CASES[1]])
def test_up_block_gradients_match_native(case):
    x, skip, kern, bias = _setup(2, *case)
    tgt = jnp.asarray(np.random.default_rng(3).standard_normal(
        (x.shape[0], skip.shape[1], skip.shape[2], kern.shape[-1]),
        dtype=np.float32))

    def loss_ref(x, skip, kern, bias):
        return jnp.mean((_ref(x, skip, kern, bias).astype(jnp.float32)
                         - tgt) ** 2)

    def loss_got(x, skip, kern, bias):
        out = up_concat_conv(x, skip, kern, bias, True).astype(jnp.float32)
        return jnp.mean((out - tgt) ** 2)

    gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, skip, kern, bias)
    ggot = jax.grad(loss_got, argnums=(0, 1, 2, 3))(x, skip, kern, bias)
    for name, r, g in zip(("dx", "dskip", "dkernel", "dbias"), gref, ggot):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_up_block_gradcheck_numeric():
    x, skip, kern, bias = _setup(4, 1, 3, 4, 3, 6, 8, 2, 3)
    f = lambda kk: jnp.sum(up_concat_conv(x, skip, kk, bias, True) ** 2)
    g = np.asarray(jax.grad(f)(kern))
    eps = 1e-3
    k0 = np.asarray(kern)
    for idx in [(0, 0, 0, 0), (1, 1, 2, 1), (2, 2, 4, 2), (1, 0, 3, 0)]:
        kp = k0.copy(); kp[idx] += eps
        km = k0.copy(); km[idx] -= eps
        num = (float(f(jnp.asarray(kp))) - float(f(jnp.asarray(km)))) / (2 * eps)
        tol = 5e-3 * max(1.0, abs(float(g[idx])))   # FD truncation scales
        assert abs(num - g[idx]) < tol, (idx, num, g[idx])


def test_decoder_up_impl_fused_matches_native(monkeypatch):
    """UpSampleBN with up_impl='fused' reproduces the native lowering from
    the SAME param tree (checkpoint compatibility) including BN stats."""
    monkeypatch.setattr(up_mod, "FORCE_INTERPRET", True)
    from mde_tpu.models.decoder import UpSampleBN

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 12), dtype=np.float32))
    skip = jnp.asarray(rng.standard_normal((1, 12, 16, 5), dtype=np.float32))
    m_nat = UpSampleBN(10, jnp.float32, "native")
    m_fus = UpSampleBN(10, jnp.float32, "fused")
    variables = m_nat.init(jax.random.PRNGKey(0), x, skip)
    assert m_fus.init(jax.random.PRNGKey(0), x, skip)["params"].keys() == \
        variables["params"].keys()
    ref = m_nat.apply(variables, x, skip)
    got = m_fus.apply(variables, x, skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # train mode: batch_stats updates flow through the fused path too
    ref_t, vr = m_nat.apply(variables, x, skip, True,
                            mutable=["batch_stats"])
    got_t, vg = m_fus.apply(variables, x, skip, True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-4),
        vr["batch_stats"], vg["batch_stats"])


def test_resolve_up_impl_gating(monkeypatch):
    """'fused' falls back to 'native' on CPU unless tests force interpret."""
    import types
    from mde_tpu.models.unet_adaptive_bins import _resolve_up_impl

    args = types.SimpleNamespace(up_impl="fused")
    monkeypatch.setattr(up_mod, "FORCE_INTERPRET", False)
    assert _resolve_up_impl(args, None) == "native"
    monkeypatch.setattr(up_mod, "FORCE_INTERPRET", True)
    assert _resolve_up_impl(args, None) == "fused"
    args.up_impl = "native"
    assert _resolve_up_impl(args, None) == "native"
