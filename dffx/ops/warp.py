"""Differentiable focal-stack warping, the TPU way.

The reference warps each focal slice by a *global* per-slice scale-about-center
plus translation, routed through 3D ``F.grid_sample`` with an identity z-grid
(`End_to_End/End_to_End.py:106-134`; simulator 2D variant
`Simulator/synthetic_blur_movement.py:15-71`).  Because the z coordinates sit
exactly on grid points, the 3D trilinear sample degenerates to an independent
2D bilinear sample per slice; and because the 2D map is axis-separable
(``src_x`` depends only on x, ``src_y`` only on y), the whole warp factorizes
into two small dense matmuls with per-slice interpolation matrices:

    out[b,n] = M_y[b,n] @ x[b,n] @ M_x[b,n]^T,   M[o,i] = relu(1 - |src(o) - i|)

which is exact ``grid_sample(align_corners=True, padding_mode='zeros')``
numerics, fully differentiable (including w.r.t. the motion parameters through
``src``), and runs on the MXU instead of lowering to gathers.

A general gather-based ``grid_sample_2d`` is provided for non-separable grids
and as a cross-check oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interp_matrix(src: jax.Array, n_in: int) -> jax.Array:
    """Rows of bilinear taps: ``M[..., o, i] = relu(1 - |src[..., o] - i|)``.

    Out-of-range ``src`` rows lose weight mass, which is exactly
    ``padding_mode='zeros'`` behaviour.
    """
    idx = jnp.arange(n_in, dtype=src.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - idx))


def affine_warp_matrices(
    fov: jax.Array, shift: jax.Array, n: int
) -> tuple[jax.Array, jax.Array]:
    """Interpolation matrix + flow field for one axis of the reference warp.

    The reference computes, for axis length ``n`` (W or H) and normalized
    lattice ``l[o] = linspace(-1, 1, n)``:

        flow[o] = (n // 2) * (fov - 1) * l[o] + shift        (pixels)
        src[o]  = o - flow[o]                                 (source pixel)

    Args:
      fov:   ``(..., )`` per-slice scale factor (1.0 = identity).
      shift: ``(..., )`` per-slice translation in pixels (beta or gamma).
      n:     axis length.

    Returns:
      ``(M, flow)`` where ``M`` is ``(..., n, n)`` and ``flow`` is ``(..., n)``.
    """
    lin = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    flow = (n // 2) * (fov[..., None] - 1.0) * lin + shift[..., None]
    src = jnp.arange(n, dtype=jnp.float32) - flow
    return _interp_matrix(src, n), flow


def affine_warp_stack(
    x: jax.Array,
    fov: jax.Array,
    beta: jax.Array,
    gamma: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Warp a focal stack by per-slice scale-about-center + translation.

    Matches ``FlowNetwork.FOV_warp`` (`End_to_End/End_to_End.py:106-134`).

    Args:
      x:     ``(B, N, H, W, C)``.
      fov:   ``(B, N)`` effective per-slice field-of-view factor (already
             including any alpha correction).
      beta:  ``(B, N)`` x-translation in pixels.
      gamma: ``(B, N)`` y-translation in pixels.

    Returns:
      ``(warped, flow)`` with ``warped`` shaped like ``x`` and ``flow`` of
      shape ``(B, N, H, W, 2)`` holding the per-pixel (x, y) pixel shifts the
      alignment network concatenates into its regression volume.
    """
    _, _, h, w, _ = x.shape
    mx, flow_x = affine_warp_matrices(fov, beta, w)  # (B,N,W,W), (B,N,W)
    my, flow_y = affine_warp_matrices(fov, gamma, h)  # (B,N,H,H), (B,N,H)
    dtype = x.dtype
    y = jnp.einsum("bnoh,bnhwc->bnowc", my.astype(dtype), x)
    y = jnp.einsum("bnowc,bnpw->bnopc", y, mx.astype(dtype))
    flow = jnp.concatenate(
        [
            jnp.broadcast_to(flow_x[:, :, None, :], (*flow_x.shape[:2], h, w))[..., None],
            jnp.broadcast_to(flow_y[:, :, :, None], (*flow_y.shape[:2], h, w))[..., None],
        ],
        axis=-1,
    )
    return y, flow.astype(dtype)


def grid_sample_2d(x: jax.Array, grid: jax.Array) -> jax.Array:
    """``F.grid_sample(x, grid, align_corners=True, padding_mode='zeros')``.

    Args:
      x:    ``(B, H, W, C)``.
      grid: ``(B, Ho, Wo, 2)`` normalized coords, ``grid[..., 0]`` = x.

    Gather-based general form (the separable fast path above should be
    preferred for affine warps).
    """
    b, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def tap(yi, xi, weight):
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yi_c, xi_c)
        return vals * (weight * inside)[..., None]

    out = (
        tap(y0, x0, (1 - wy) * (1 - wx))
        + tap(y0, x0 + 1, (1 - wy) * wx)
        + tap(y0 + 1, x0, wy * (1 - wx))
        + tap(y0 + 1, x0 + 1, wy * wx)
    )
    return out.astype(x.dtype)
