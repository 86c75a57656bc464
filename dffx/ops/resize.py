"""Bilinear 2D upsampling as interpolation-matrix matmuls (MXU-native).

Reproduces torch-1.6 ``F.upsample(..., mode='bilinear')`` — i.e.
``F.interpolate(align_corners=False)`` (`Depth_Estimation_Network.py:86,111,113`)
— exactly: source coordinate ``(o + 0.5) * in/out - 0.5`` with edge clamping.

Because every output size in the pipeline is static, we build the (out, in)
interpolation matrices once as NumPy constants and apply them as two dense
matmuls.  On TPU this runs on the MXU and fuses with the surrounding
elementwise work, instead of lowering to gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def bilinear_matrix(n_in: int, n_out: int, align_corners: bool = False) -> np.ndarray:
    """(n_out, n_in) row-stochastic 1D bilinear interpolation matrix."""
    m = np.zeros((n_out, n_in), dtype=np.float64)
    if align_corners and n_out > 1:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = src - lo
    m[np.arange(n_out), lo] += 1.0 - w_hi
    m[np.arange(n_out), hi] += w_hi
    return m.astype(np.float32)


def upsample_bilinear(
    x: jax.Array, size: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """torch ``F.interpolate(x, size, mode='bilinear')`` for (..., H, W) arrays.

    The two trailing axes are resized; any number of leading batch/channel axes
    is allowed (the reference applies this to ``(B, N, H, W)`` cost slices).
    """
    h_out, w_out = size
    h_in, w_in = x.shape[-2], x.shape[-1]
    if (h_in, w_in) == (h_out, w_out):
        return x
    my = jnp.asarray(bilinear_matrix(h_in, h_out, align_corners), dtype=x.dtype)
    mx = jnp.asarray(bilinear_matrix(w_in, w_out, align_corners), dtype=x.dtype)
    # (..., H, W) -> (..., Hout, W) -> (..., Hout, Wout)
    y = jnp.einsum("oh,...hw->...ow", my, x, preferred_element_type=x.dtype)
    return jnp.einsum("...ow,pw->...op", y, mx, preferred_element_type=x.dtype)
