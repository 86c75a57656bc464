"""Softplus-normalized soft-argmax depth regression over the focus axis.

Matches the reference's four depth heads
(`Depth_Estimation_Network.py:88-90, :116-126`):

    p = softplus(cost) + 1e-6;  p /= sum_N p;  depth = sum_N focus_dist * p

The reference tiles ``focus_dists`` to ``(N, H, W)`` per sample; here it is a
``(B, N)`` vector broadcast.  The whole head is elementwise + a length-N
reduction, which XLA fuses into a single VPU pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softplus_argmax(cost: jax.Array, focus_dists: jax.Array) -> jax.Array:
    """Regress depth from a per-slice cost volume.

    Args:
      cost:        ``(B, N, H, W)`` raw per-slice scores.
      focus_dists: ``(B, N)`` focus distances (any monotone unit).

    Returns:
      ``(B, H, W)`` expected focus distance per pixel.
    """
    p = jax.nn.softplus(cost.astype(jnp.float32)) + 1e-6
    p = p / jnp.sum(p, axis=1, keepdims=True)
    return jnp.einsum("bnhw,bn->bhw", p, focus_dists.astype(jnp.float32)).astype(cost.dtype)
