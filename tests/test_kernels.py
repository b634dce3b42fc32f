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
