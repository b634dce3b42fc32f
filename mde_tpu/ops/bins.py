"""Adaptive-bins arithmetic (reference models/unet_adaptive_bins.py:292-302).

Normalized bin widths from the mViT regressor are scaled to the depth range,
left-padded with min_depth, and cumulatively summed into edges; the depth map
is the softmax-weighted sum of bin centers. All ops are tiny reductions over
the bins axis that XLA fuses into the surrounding convolutions.
"""

import jax.numpy as jnp


def bin_edges_from_widths(bin_widths_normed: jnp.ndarray,
                          min_depth: float, max_depth: float) -> jnp.ndarray:
    """(N, n_bins) normalized widths -> (N, n_bins + 1) monotone edges."""
    widths = (max_depth - min_depth) * bin_widths_normed
    widths = jnp.pad(widths, ((0, 0), (1, 0)), constant_values=min_depth)
    return jnp.cumsum(widths, axis=1)


def bin_centers(bin_edges: jnp.ndarray) -> jnp.ndarray:
    """(N, n_bins + 1) edges -> (N, n_bins) centers."""
    return 0.5 * (bin_edges[:, :-1] + bin_edges[:, 1:])


def depth_from_bins(bin_probs_nhwc: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Softmax-over-bins probabilities (N, H, W, n_bins) x centers (N, n_bins)
    -> depth (N, H, W, 1). The contraction over bins is a batched matvec the
    MXU handles directly."""
    depth = jnp.einsum('nhwb,nb->nhw', bin_probs_nhwc, centers)
    return depth[..., None]
