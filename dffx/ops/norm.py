"""BatchNorm with PyTorch-exact train/eval numerics.

Matches ``nn.BatchNorm3d`` (reference `Depth_Estimation_Network.py:286-289`):

* eval: normalize with *running* mean/var (checkpoint parity depends on this);
* train: normalize with the biased batch variance, update running stats with
  the **unbiased** batch variance scaled by ``n / (n - 1)`` at momentum 0.1
  (torch default) — note this differs from flax's BatchNorm, which stores the
  biased variance; we implement it directly for parity.

Stats always accumulate in float32 even under a bfloat16 compute policy.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

EPS = 1e-5
MOMENTUM = 0.1  # torch default: new = (1 - m) * old + m * batch


def batch_norm(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    *,
    eps: float = EPS,
) -> jax.Array:
    """Normalize with given statistics; channels along the last axis."""
    dtype = x.dtype
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = (weight.astype(jnp.float32) * inv).astype(dtype)
    shift = (
        bias.astype(jnp.float32) - mean.astype(jnp.float32) * weight.astype(jnp.float32) * inv
    ).astype(dtype)
    return x * scale + shift


def batch_norm_train(
    x: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    *,
    eps: float = EPS,
    momentum: float = MOMENTUM,
    axis_name: str | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Training-mode batch norm.

    Returns ``(y, new_running_mean, new_running_var)``.

    If ``axis_name`` is given, batch statistics are averaged across that mapped
    mesh axis (sync-BN). The default (None) matches the reference's
    ``nn.DataParallel`` behaviour of per-replica statistics.
    """
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    mean = jnp.mean(xf, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
        n *= lax.psum(1, axis_name)
    var = mean_sq - jnp.square(mean)  # biased, used for normalization
    y = batch_norm(x, mean, var, weight, bias, eps=eps)
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1.0 - momentum) * running_mean.astype(jnp.float32) + momentum * mean
    new_var = (1.0 - momentum) * running_var.astype(jnp.float32) + momentum * unbiased
    return y, new_mean, new_var
