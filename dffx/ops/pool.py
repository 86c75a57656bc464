"""Pooling ops: (1,k,k) max/avg windows and adaptive averaging over the stack.

Covers the reference's ``MaxPool3d((1,2,2))`` (EFD,
`Depth_Estimation_Network.py:310`), ``AvgPool3d((1,k,k))`` pyramid
(`:149-153`), and ``AdaptiveAvgPool3d((10,1,1))`` in the alignment head
(`End_to_End/End_to_End.py:40`).  All are `lax.reduce_window` / static-segment
means; the focus axis N is never strided by the model's pools.
"""

from __future__ import annotations

import math

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax


def _triple(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v, v)


def max_pool3d(x: jax.Array, window, stride=None) -> jax.Array:
    """torch ``nn.MaxPool3d(window, stride)`` (no padding) in NDHWC."""
    w = _triple(window)
    s = _triple(stride) if stride is not None else w
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, *w, 1),
        window_strides=(1, *s, 1),
        padding="VALID",
    )


def avg_pool3d(x: jax.Array, window, stride=None) -> jax.Array:
    """torch ``nn.AvgPool3d(window, stride)`` (no padding) in NDHWC."""
    w = _triple(window)
    s = _triple(stride) if stride is not None else w
    # NB: init must be a concrete (numpy) scalar — a traced jnp constant breaks
    # reduce_window's linearization under jit-of-grad.
    summed = lax.reduce_window(
        x,
        np.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, *w, 1),
        window_strides=(1, *s, 1),
        padding="VALID",
    )
    return summed / math.prod(w)


def adaptive_avg_pool_focus(x: jax.Array, n_out: int) -> jax.Array:
    """torch ``AdaptiveAvgPool3d((n_out, 1, 1))`` in NDHWC.

    Averages H and W away entirely and adaptively resamples the focus axis to
    ``n_out`` with torch's segment rule ``[floor(i*N/n_out), ceil((i+1)*N/n_out))``.
    Returns ``(B, n_out, 1, 1, C)``.
    """
    b, n, h, w, c = x.shape
    pooled = jnp.mean(x, axis=(2, 3))  # (B, N, C)
    if n == n_out:
        out = pooled
    else:
        segs = []
        for i in range(n_out):
            lo = (i * n) // n_out
            hi = -(-((i + 1) * n) // n_out)  # ceil
            segs.append(jnp.mean(pooled[:, lo:hi, :], axis=1))
        out = jnp.stack(segs, axis=1)
    return out[:, :, None, None, :]
