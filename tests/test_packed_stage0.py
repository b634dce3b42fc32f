"""Oracle tests: the W-packed stage-0 encoder path (--hires_impl packed)
computes the same function as the native layout, with an identical variable
tree (checkpoint compatibility).

The packed path (models/efficientnet.py::PackedDSBlock) folds 4-8 W pixels
into the 128-lane tile so BN/SE/elementwise traffic runs at full lane
density and the depthwise conv becomes an equivalent dense MXU conv
(dw_dense_weight). All of that is a schedule change only — these tests pin
value parity (fwd, train + eval), batch-stats updates, and gradients at f32
on both B1 (stage-0 pack 4 -> repack 8) and B5 (stem 48: pack 2 -> repack 4,
residual blocks) geometries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mde_tpu.models.efficientnet import EfficientNetEncoder


def _encoders(arch):
    nat = EfficientNetEncoder(arch, dtype=jnp.float32, name="encoder")
    pk = EfficientNetEncoder(arch, dtype=jnp.float32, hires_impl="packed",
                             name="encoder")
    return nat, pk


def _tree_paths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)}


@pytest.mark.parametrize("arch", ["efficientnet-b1", "efficientnet-b5"])
def test_packed_stage0_matches_native(arch):
    nat, pk = _encoders(arch)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 96, 3), np.float32))
    v = nat.init({"params": jax.random.PRNGKey(0)}, x, False)
    v_pk = pk.init({"params": jax.random.PRNGKey(0)}, x, False)

    # identical variable trees (names AND shapes) -> checkpoints interchange
    assert _tree_paths(v) == _tree_paths(v_pk)
    for p, a in jax.tree_util.tree_leaves_with_path(v):
        b = v_pk
        assert jax.tree_util.tree_map(lambda t: t.shape, a) == \
            jax.tree_util.tree_map(lambda t: t.shape,
                                   _get_by_path(b, p)), jax.tree_util.keystr(p)

    # eval-mode forward parity on every feature
    f_nat = nat.apply(v, x, False)
    f_pk = pk.apply(v, x, False)
    assert len(f_nat) == len(f_pk)
    for i, (a, b) in enumerate(zip(f_nat, f_pk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4, err_msg=f"feature {i}")

    # train-mode forward + batch-stats parity
    (f_nat, m_nat) = nat.apply(v, x, True, mutable=["batch_stats"],
                               rngs={"drop_path": jax.random.PRNGKey(1)})
    (f_pk, m_pk) = pk.apply(v, x, True, mutable=["batch_stats"],
                            rngs={"drop_path": jax.random.PRNGKey(1)})
    for i, (a, b) in enumerate(zip(f_nat, f_pk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4, err_msg=f"feature {i}")
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(m_nat["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(m_pk["batch_stats"])):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(pa))


def _get_by_path(tree, path):
    node = tree
    for k in path:
        node = node[k.key if hasattr(k, "key") else k.idx]
    return node


def test_packed_stage0_under_dp_mesh():
    """GSPMD batch-sharding composes with the packed layout: the packed
    encoder jitted over the 8-device DP mesh matches the single-device
    forward (the pack/unpack reshapes keep the batch axis leading, so the
    data-axis partition passes straight through)."""
    from mde_tpu.parallel import make_mesh, batch_sharding, replicated_sharding

    _, pk = _encoders("efficientnet-b1")
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((8, 64, 96, 3), np.float32))
    v = pk.init({"params": jax.random.PRNGKey(0)}, x, False)
    ref = pk.apply(v, x, False)[-1]

    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    vs = jax.device_put(v, replicated_sharding(mesh))
    out = jax.jit(lambda v, x: pk.apply(v, x, False)[-1])(vs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_stage0_grad_parity():
    nat, pk = _encoders("efficientnet-b1")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 96, 3), np.float32))
    v = nat.init({"params": jax.random.PRNGKey(0)}, x, False)

    def loss(mod, params, x):
        feats, _ = mod.apply({"params": params,
                              "batch_stats": v["batch_stats"]},
                             x, True, mutable=["batch_stats"],
                             rngs={"drop_path": jax.random.PRNGKey(1)})
        return sum(jnp.sum(jnp.square(f)) / f.size for f in feats[4:])

    g_nat = jax.grad(loss, argnums=(1, 2))(nat, v["params"], x)
    g_pk = jax.grad(loss, argnums=(1, 2))(pk, v["params"], x)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_nat),
            jax.tree_util.tree_leaves_with_path(g_pk)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(pa))
