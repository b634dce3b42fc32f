"""Pallas kernel tests (interpret mode on the CPU mesh): value + gradient
parity against the jnp chamfer implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from mde_tpu.kernels.chamfer import chamfer_1d_pallas
from mde_tpu.ops.bins import bin_edges_from_widths
from mde_tpu.ops.losses import bins_chamfer_loss


def _setup(seed=0, n=2, p=16, hw=(24, 32)):
    rng = np.random.default_rng(seed)
    widths = rng.random((n, p), dtype=np.float32)
    widths /= widths.sum(1, keepdims=True)
    edges = bin_edges_from_widths(jnp.asarray(widths), 1e-3, 10.0)
    depth = rng.random((n, *hw, 1), dtype=np.float32) * 10
    depth[depth < 0.4] = 0.0
    return edges, jnp.asarray(depth)


def test_chamfer_pallas_value_matches_jnp():
    edges, depth = _setup()
    ref = float(bins_chamfer_loss(edges, depth, chunk=96))
    got = float(chamfer_1d_pallas(edges, depth, tile=128, interpret=True))
    assert abs(got - ref) < 1e-5 * max(1.0, abs(ref))


def test_chamfer_pallas_gradient_matches_jnp():
    edges, depth = _setup(seed=3)

    ref_grad = jax.grad(lambda e: bins_chamfer_loss(e, depth, chunk=96))(edges)
    got_grad = jax.grad(lambda e: chamfer_1d_pallas(e, depth, tile=128,
                                                    interpret=True))(edges)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-6)


def test_chamfer_pallas_no_valid_pixels():
    edges, _ = _setup()
    depth = jnp.zeros((2, 24, 32, 1))
    v = float(chamfer_1d_pallas(edges, depth, tile=128, interpret=True))
    assert v == 0.0
    g = jax.grad(lambda e: chamfer_1d_pallas(e, depth, tile=128, interpret=True))(edges)
    assert np.all(np.asarray(g) == 0.0)


def test_chamfer_pallas_gradcheck_numeric():
    edges, depth = _setup(seed=5, p=8, hw=(12, 16))
    f = lambda e: chamfer_1d_pallas(e, depth, tile=64, interpret=True)
    g = np.asarray(jax.grad(f)(edges))
    eps = 1e-3
    e0 = np.asarray(edges)
    for (i, j) in [(0, 1), (0, 4), (1, 8)]:
        ep = e0.copy(); ep[i, j] += eps
        em = e0.copy(); em[i, j] -= eps
        num = (float(f(jnp.asarray(ep))) - float(f(jnp.asarray(em)))) / (2 * eps)
        assert abs(num - g[i, j]) < 5e-3, (i, j, num, g[i, j])


# ---------------------------------------------------------------------------
# Fused bins head (kernels/bins_head.py): conv_out + softmax + centers

def _head_setup(seed=0, b=2, h=8, w=16, n=128, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((b, h, w, 128)), dtype=dtype)
    kernel = jnp.asarray(0.1 * rng.standard_normal((1, 1, 128, n)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((n,)), jnp.float32)
    widths = rng.random((b, n), dtype=np.float32)
    widths /= widths.sum(1, keepdims=True)
    edges = bin_edges_from_widths(jnp.asarray(widths), 1e-3, 10.0)
    centers = 0.5 * (edges[:, 1:] + edges[:, :-1])
    return feats, kernel, bias, centers


def _head_reference(feats, kernel, bias, centers):
    """The unfused model path (unet_adaptive_bins.py conv_out -> softmax ->
    depth_from_bins), with the same bf16 rounding points."""
    from mde_tpu.ops.bins import depth_from_bins
    logits = jnp.einsum("bhwc,cn->bhwn", feats,
                        kernel[0, 0].astype(feats.dtype),
                        preferred_element_type=jnp.float32)
    if feats.dtype == jnp.bfloat16:
        logits = (logits.astype(jnp.bfloat16)
                  + bias.astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return depth_from_bins(probs, centers)


def test_fused_head_value_matches_jnp():
    from mde_tpu.kernels.bins_head import fused_bins_head
    feats, kernel, bias, centers = _head_setup()
    ref = _head_reference(feats, kernel, bias, centers)
    got = fused_bins_head(feats, kernel, bias, centers, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_head_value_bf16():
    from mde_tpu.kernels.bins_head import fused_bins_head
    feats, kernel, bias, centers = _head_setup(seed=2, dtype=jnp.bfloat16)
    ref = _head_reference(feats, kernel, bias, centers)
    got = fused_bins_head(feats, kernel, bias, centers, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_head_gradients_match_jnp():
    from mde_tpu.kernels.bins_head import fused_bins_head
    feats, kernel, bias, centers = _head_setup(seed=7)
    tgt = jnp.asarray(np.random.default_rng(9).random(
        (feats.shape[0], feats.shape[1], feats.shape[2], 1)), jnp.float32)

    def loss_ref(f, k, b, c):
        return jnp.mean((_head_reference(f, k, b, c) - tgt) ** 2)

    def loss_got(f, k, b, c):
        return jnp.mean((fused_bins_head(f, k, b, c, interpret=True) - tgt) ** 2)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(feats, kernel, bias, centers)
    got_grads = jax.grad(loss_got, argnums=(0, 1, 2, 3))(feats, kernel, bias, centers)
    for rg, gg in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Kernels composed with the mesh via shard_map (kernels/sharded.py): each
# device runs the Mosaic program on its local batch shard; the chamfer scalar
# is finished by a pmean over 'data'. Runs on the conftest 8-device CPU mesh
# in interpret mode — VERDICT r2 next #5.

def _mesh8():
    from mde_tpu.parallel import make_mesh
    return make_mesh("8")


def test_chamfer_sharded_matches_unsharded(monkeypatch):
    import mde_tpu.kernels.chamfer as chamfer_mod
    from mde_tpu.kernels.sharded import chamfer_1d_pallas_sharded
    monkeypatch.setattr(chamfer_mod, "FORCE_INTERPRET", True)
    mesh = _mesh8()
    edges, depth = _setup(seed=11, n=8)

    ref = float(chamfer_1d_pallas(edges, depth, interpret=True))
    got = float(jax.jit(
        lambda e, d: chamfer_1d_pallas_sharded(e, d, mesh=mesh))(edges, depth))
    assert abs(got - ref) < 1e-5 * max(1.0, abs(ref))

    ref_g = jax.grad(lambda e: chamfer_1d_pallas(e, depth, interpret=True))(edges)
    got_g = jax.grad(
        lambda e: chamfer_1d_pallas_sharded(e, depth, mesh=mesh))(edges)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-6)


def test_chamfer_sharded_indivisible_batch_falls_back(monkeypatch):
    import mde_tpu.kernels.chamfer as chamfer_mod
    from mde_tpu.kernels.sharded import chamfer_1d_pallas_sharded
    monkeypatch.setattr(chamfer_mod, "FORCE_INTERPRET", True)
    mesh = _mesh8()
    edges, depth = _setup(seed=12, n=3)  # 3 % 8 != 0 -> unwrapped path
    ref = float(chamfer_1d_pallas(edges, depth, interpret=True))
    got = float(chamfer_1d_pallas_sharded(edges, depth, mesh=mesh))
    assert abs(got - ref) < 1e-5 * max(1.0, abs(ref))


def test_fused_head_sharded_matches_unsharded(monkeypatch):
    import mde_tpu.kernels.bins_head as bins_head_mod
    from mde_tpu.kernels.bins_head import fused_bins_head
    from mde_tpu.kernels.sharded import fused_bins_head_sharded
    monkeypatch.setattr(bins_head_mod, "FORCE_INTERPRET", True)
    mesh = _mesh8()
    feats, kernel, bias, centers = _head_setup(seed=13, b=8)

    ref = fused_bins_head(feats, kernel, bias, centers, interpret=True)
    got = jax.jit(lambda f, k, b, c: fused_bins_head_sharded(
        f, k, b, c, mesh=mesh))(feats, kernel, bias, centers)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    tgt = jnp.asarray(np.random.default_rng(14).random(
        (feats.shape[0], feats.shape[1], feats.shape[2], 1)), jnp.float32)
    ref_g = jax.grad(lambda f: jnp.mean(
        (fused_bins_head(f, kernel, bias, centers, interpret=True) - tgt) ** 2))(feats)
    got_g = jax.grad(lambda f: jnp.mean(
        (fused_bins_head_sharded(f, kernel, bias, centers, mesh=mesh) - tgt) ** 2))(feats)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-6)


def test_fused_head_model_path_matches_unfused(monkeypatch):
    """UnetAdaptiveBins(fused_head=True) is value-identical to the default
    path and produces the identical parameter tree (checkpoint compat)."""
    import mde_tpu.kernels.bins_head as bins_head_mod
    from mde_tpu.models.unet_adaptive_bins import UnetAdaptiveBins
    monkeypatch.setattr(bins_head_mod, "FORCE_INTERPRET", True)

    kw = dict(n_bins=128, min_val=1e-3, max_val=10.0,
              encoder_name="efficientnet-b1")
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 128, 3)),
                    jnp.float32)
    m0 = UnetAdaptiveBins(**kw)
    m1 = UnetAdaptiveBins(fused_head=True, **kw)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    p0 = jax.tree_util.tree_structure(v0)
    p1 = jax.tree_util.tree_structure(v1)
    assert p0 == p1
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    e0, d0 = m0.apply(v0, x, train=False)
    e1, d1 = m1.apply(v1, x, train=False)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e0))
