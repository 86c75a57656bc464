"""Pallas TPU kernels for the bandwidth/utilization-critical full-resolution
stages.

Why: the reference's hottest op — the full-res dilated (1,9,9) focus-measure
conv (`Depth_Estimation_Network.py:135`) — has 3 input / 8 output channels.
XLA's native conv lowering reaches ~0.5 TFLOP/s on it (tiny channel counts
tile the MXU at a few percent), and a plain im2col matmul in XLA is worse (the
243-channel patch tensor round-trips HBM).  The Pallas kernel builds the patch
matrix **in VMEM**, runs one MXU contraction per row-tile, and applies the
BatchNorm + ReLU epilogue in-register — input is read from HBM once, output
written once.

Layout note: inside the kernel everything is channel-FIRST with W on the lane
axis — a trailing dim of 3 or 8 would be padded to 128 lanes in VMEM and
overflow it 40x.  The host wrapper transposes at HBM cost (~0.1 ms), which the
kernel wins back many times over.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_TILE = 32
K_TAPS = 9 * 9 * 3  # ky, kx, cin
K_PAD = 256


def _fm_conv_kernel(x_ref, w_ref, scale_ref, shift_ref, o_ref, window, patches):
    """Grid = (B*N slices, H row-tiles); channel-first layouts.

    x_ref:    (1, 3, H + 16, W + 16) padded slice (VMEM, revisited per tile)
    w_ref:    (K_PAD, 8)  K index = (ky*9 + kx)*3 + cin
    scale/shift: (8, 1) fused eval-BN affine (fp32)
    o_ref:    (1, 8, H_TILE, W) — one row tile
    window:   (3, H_TILE + 16, W + 16) scratch — the tile's input rows
    patches:  (K_PAD, H_TILE, W) scratch, input dtype
    """
    w = o_ref.shape[3]
    t = pl.program_id(1)
    base = pl.multiple_of(t * H_TILE, H_TILE)
    # Exactly ONE dynamic-offset copy per tile: Mosaic (as deployed here)
    # crashes on kernels with many (>~80) dynamic-base strided copies, so the
    # row window is staged once and the 243 tap slices below are all static.
    window[:, :, :] = x_ref[0, :, pl.ds(base, H_TILE + 16), :]
    # zero the K padding rows: scratch memory is uninitialized and 0 * garbage
    # (or NaN) would poison the fp32 accumulation
    patches[K_TAPS:, :, :] = jnp.zeros((K_PAD - K_TAPS, H_TILE, w), patches.dtype)
    for ky in range(9):
        for kx in range(9):
            for c in range(3):
                row = (ky * 9 + kx) * 3 + c
                patches[row, :, :] = window[
                    c, 2 * ky : 2 * ky + H_TILE, 2 * kx : 2 * kx + w
                ]
    acc = jax.lax.dot_general(
        w_ref[:],
        patches[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, H_TILE, W)
    y = acc * scale_ref[:, 0][:, None, None] + shift_ref[:, 0][:, None, None]
    y = jnp.maximum(y, 0.0)
    o_ref[0, :, :, :] = y.astype(o_ref.dtype)


def fm_conv_bn_relu(x: jax.Array, w: jax.Array, scale: jax.Array, shift: jax.Array) -> jax.Array:
    """Fused ``Conv3d(3→8, k=(1,9,9), pad=(0,8,8), dil=(1,2,2)) + BN(eval) + ReLU``.

    Args:
      x: ``(B, N, H, W, 3)`` focal stack (H % 16 == 0).
      w: ``(1, 9, 9, 3, 8)`` conv kernel (dffx DHWIO layout).
      scale/shift: ``(8,)`` fp32 fused BN affine.

    Returns ``(B, N, H, W, 8)`` in x.dtype.
    """
    b, n, h, width, _ = x.shape
    assert h % H_TILE == 0, (h, H_TILE)
    xs = x.reshape(b * n, h, width, 3).transpose(0, 3, 1, 2)  # (BN, 3, H, W)
    xp = jnp.pad(xs, ((0, 0), (0, 0), (8, 8), (8, 8)))

    wk = jnp.zeros((K_PAD, 8), w.dtype)
    wk = wk.at[:K_TAPS].set(w[0].reshape(K_TAPS, 8))

    out = pl.pallas_call(
        _fm_conv_kernel,
        out_shape=jax.ShapeDtypeStruct((b * n, 8, h, width), x.dtype),
        grid=(b * n, h // H_TILE),
        in_specs=[
            pl.BlockSpec((1, 3, h + 16, width + 16), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_PAD, 8), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, H_TILE, width), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, H_TILE + 16, width + 16), x.dtype),
            pltpu.VMEM((K_PAD, H_TILE, width), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * h * width * K_TAPS * 8,
            bytes_accessed=xs.size * xs.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(xp, wk.astype(x.dtype), scale.reshape(8, 1), shift.reshape(8, 1))
    return out.transpose(0, 2, 3, 1).reshape(b, n, h, width, 8)


def bn_fused_affine(weight, bias, mean, var, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Fold eval-mode BatchNorm into a (scale, shift) pair."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = weight.astype(jnp.float32) * inv
    shift = bias.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return scale, shift
