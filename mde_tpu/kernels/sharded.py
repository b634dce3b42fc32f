"""Pallas kernels composed with the production mesh (VERDICT r2 next #5).

GSPMD cannot partition a Mosaic custom call: under a data-sharded jit it
falls back to gathering the full batch onto every chip, running the kernel
replicated, and discarding the redundant work — correct but unscaled. These
wrappers shard_map the kernels over the 'data' axis instead, so each chip
runs its Mosaic program on its local batch shard:

- fused_bins_head: a pure per-sample map — batch in, batch out, weights
  replicated; no collective needed.
- chamfer: per-sample losses reduced to one scalar by a mean over the global
  batch — each shard computes its local mean and a pmean over 'data'
  finishes the reduction (equal local batch sizes make mean-of-means exact).

With no mesh, a 1-device data axis, or a batch that doesn't divide the data
axis (eval tails), the unwrapped single-device kernel is used — GSPMD then
handles any resharding around it.
"""

import functools

import jax
from jax.sharding import PartitionSpec as P

from .bins_head import fused_bins_head
from .chamfer import chamfer_1d_pallas

try:  # jax >= 0.6 exposes shard_map at the top level
    _shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# pallas_call's out_shape carries no varying-mesh-axes annotation, which the
# VMA checker rejects inside shard_map — disable the check (replication is
# handled explicitly: weights arrive replicated, the chamfer scalar is
# pmean-reduced). Kwarg name depends on jax version.
import inspect as _inspect

_sm_params = _inspect.signature(_shard_map).parameters
if "check_vma" in _sm_params:
    _SM_KW = {"check_vma": False}
elif "check_rep" in _sm_params:  # pragma: no cover - older jax
    _SM_KW = {"check_rep": False}
else:  # pragma: no cover
    _SM_KW = {}


def _data_axis_size(mesh) -> int:
    if mesh is None:
        return 0
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 0)


def fused_bins_head_sharded(features_nhwc, conv_kernel, conv_bias, centers,
                            mesh=None):
    """fused_bins_head run per-shard over the mesh's 'data' axis."""
    n = _data_axis_size(mesh)
    if n <= 1 or features_nhwc.shape[0] % n:
        return fused_bins_head(features_nhwc, conv_kernel, conv_bias, centers)
    fn = _shard_map(fused_bins_head, mesh=mesh,
                    in_specs=(P("data"), P(), P(), P("data")),
                    out_specs=P("data"), **_SM_KW)
    return fn(features_nhwc, conv_kernel, conv_bias, centers)


def chamfer_1d_pallas_sharded(bin_edges, target_depth_nhwc, mesh=None):
    """chamfer_1d_pallas with the batch-mean finished by a pmean over 'data'."""
    n = _data_axis_size(mesh)
    if n <= 1 or bin_edges.shape[0] % n:
        return chamfer_1d_pallas(bin_edges, target_depth_nhwc)

    def local(edges, depth):
        return jax.lax.pmean(chamfer_1d_pallas(edges, depth), "data")

    fn = _shard_map(local, mesh=mesh, in_specs=(P("data"), P("data")),
                    out_specs=P(), **_SM_KW)
    return fn(bin_edges, target_depth_nhwc)
