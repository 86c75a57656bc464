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


def _dot_precision(dtype):
    """fp32 inputs need HIGHEST (3-pass bf16) MXU precision to behave like
    fp32; bf16 inputs use the default single pass."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


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
        precision=_dot_precision(patches.dtype),
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
    xs = x.reshape(b * n, h, width, 3).transpose(0, 3, 1, 2)  # (BN, 3, H, W)
    out = fm_conv_bn_relu_cf(xs, w, scale, shift)
    return out.transpose(0, 2, 3, 1).reshape(b, n, h, width, 8)


def fm_conv_bn_relu_cf(xs: jax.Array, w, scale, shift) -> jax.Array:
    """Channel-first core: (BN, 3, H, W) -> (BN, 8, H, W).  Chain with the SRD
    kernels without intermediate layout transposes."""
    bn_, _, h, width = xs.shape
    assert h % H_TILE == 0, (h, H_TILE)
    if width > 384:
        # the deployed Mosaic compile helper fails (load-dependent) on this
        # kernel beyond 384-lane tiles; split W with the dilated conv's
        # 8-column halo (kept outputs only read real columns)
        mid = max(width // 2 // 128, 1) * 128
        left = fm_conv_bn_relu_cf(xs[..., : mid + 8], w, scale, shift)[..., :mid]
        right = fm_conv_bn_relu_cf(xs[..., mid - 8 :], w, scale, shift)[..., 8:]
        return jnp.concatenate([left, right], axis=-1)
    # stored patch slices need 128-multiple lane extents (Mosaic constraint);
    # extra zero columns are the conv's own padding semantics, sliced off below
    wl = -(-width // 128) * 128
    xp = jnp.pad(xs, ((0, 0), (0, 0), (8, 8), (8, 8 + wl - width)))

    wk = jnp.zeros((K_PAD, 8), w.dtype)
    wk = wk.at[:K_TAPS].set(w[0].reshape(K_TAPS, 8))

    out = pl.pallas_call(
        _fm_conv_kernel,
        out_shape=jax.ShapeDtypeStruct((bn_, 8, h, wl), xs.dtype),
        grid=(bn_, h // H_TILE),
        in_specs=[
            pl.BlockSpec((1, 3, h + 16, wl + 16), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_PAD, 8), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, H_TILE, wl), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, H_TILE + 16, wl + 16), xs.dtype),
            pltpu.VMEM((K_PAD, H_TILE, wl), xs.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bn_ * h * width * K_TAPS * 8,
            bytes_accessed=xs.size * xs.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(xp, wk.astype(xs.dtype), scale.reshape(8, 1), shift.reshape(8, 1))
    return out[:, :, :, :width]


def bn_fused_affine(weight, bias, mean, var, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Fold eval-mode BatchNorm into a (scale, shift) pair."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = weight.astype(jnp.float32) * inv
    shift = bias.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return scale, shift


# ---------------------------------------------------------------------------
# SRD fusion: residual (1,3,3) conv pair + focus-axis attention
# (`Depth_Estimation_Network.py:295-330`).  Two kernels:
#   A. rb2d: relu(x + bn2(conv2(relu(bn1(conv1(x)))))) — per-slice spatial.
#   B. attention: f + relu(W2 @ relu(Wn @ cat(f[n-1], f[n], f[n+1]))) — mixes
#      the focus axis, no spatial halo, so tiles are exact (no dynamic offsets).
# ---------------------------------------------------------------------------

RB_H_TILE = 16


def _rb2d_kernel(x_ref, w1_ref, w2_ref, s1_ref, b1_ref, s2_ref, b2_ref, o_ref,
                 window, patches, patches2, r1, *, c: int, w_real: int,
                 high_precision: bool):
    """Grid (B*N, tiles).  x_ref (1, C, H+4, W+4) padded slice; o_ref
    (1, C, RB_H_TILE, W); w1/w2 (9C pad, C); aff (4, C) = bn1 scale/shift,
    bn2 scale/shift; window (C, T+4, W+4); patches (9C pad, T+2, W);
    patches2 (9C pad, T, W); r1 (C, T+2, W).

    Mosaic (as deployed) constraints honored here: one dynamic-offset copy,
    full-region stores only, and every stored slice's lane extent a multiple
    of 128 (W is; W+2 is not — so conv1 runs at width W and conv2's column
    halo, which is zero by construction, is realized with pltpu.roll + masks).
    """
    wd = o_ref.shape[3]
    t = pl.program_id(1)
    base = pl.multiple_of(t * RB_H_TILE, RB_H_TILE)
    kpad = patches.shape[0]
    window[:, :, :] = x_ref[0, :, pl.ds(base, RB_H_TILE + 4), :].astype(window.dtype)
    prec = jax.lax.Precision.HIGHEST if high_precision else None

    # conv1 on (T+2 rows, W cols): rows give conv2 its vertical halo locally
    patches[9 * c :, :, :] = jnp.zeros((kpad - 9 * c, RB_H_TILE + 2, wd), patches.dtype)
    patches2[9 * c :, :, :] = jnp.zeros((kpad - 9 * c, RB_H_TILE, wd), patches2.dtype)
    for ci in range(c):
        for ky in range(3):
            for kx in range(3):
                # output row r (local, -1-based) uses window row r+ky; output
                # col j uses window col j+1+kx  (window origin = orig - 2)
                patches[ci * 9 + ky * 3 + kx, :, :] = window[
                    ci, ky : ky + RB_H_TILE + 2, kx + 1 : kx + 1 + wd
                ]
    acc = jax.lax.dot_general(
        w1_ref[:], patches[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (C, T+2, W)
    y = jnp.maximum(
        acc * s1_ref[:, 0][:, None, None] + b1_ref[:, 0][:, None, None], 0.0
    )
    # conv2 zero-pads its input: top/bottom tile-edge rows beyond the image,
    # and (when W was lane-padded) columns past the true width
    row = jax.lax.broadcasted_iota(jnp.int32, (RB_H_TILE + 2, wd), 0)
    colf = jax.lax.broadcasted_iota(jnp.int32, (RB_H_TILE + 2, wd), 1)
    valid = ((row >= 1) | (t != 0)) & (
        (row <= RB_H_TILE) | (t != pl.num_programs(1) - 1)
    ) & (colf < w_real)
    r1[:, :, :] = jnp.where(valid[None], y, 0.0).astype(r1.dtype)

    # conv2 on (T, W); column halo (zeros) via lane roll + edge masks
    col = jax.lax.broadcasted_iota(jnp.int32, (RB_H_TILE, wd), 1)
    for ci in range(c):
        for ky in range(3):
            v = r1[ci, ky : ky + RB_H_TILE, :]
            patches2[ci * 9 + ky * 3 + 0, :, :] = jnp.where(
                col >= 1, pltpu.roll(v, 1, axis=1), 0.0
            ).astype(patches2.dtype)
            patches2[ci * 9 + ky * 3 + 1, :, :] = v
            patches2[ci * 9 + ky * 3 + 2, :, :] = jnp.where(
                col <= w_real - 2, pltpu.roll(v, wd - 1, axis=1), 0.0
            ).astype(patches2.dtype)
    acc2 = jax.lax.dot_general(
        w2_ref[:], patches2[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (C, T, W)
    y2 = acc2 * s2_ref[:, 0][:, None, None] + b2_ref[:, 0][:, None, None]
    center = window[:, 2 : 2 + RB_H_TILE, 2 : 2 + wd].astype(jnp.float32)
    o_ref[0, :, :, :] = jnp.maximum(center + y2, 0.0).astype(o_ref.dtype)


def _pack_conv33(w: jax.Array, kpad: int, dtype) -> jax.Array:
    """(1,3,3,C,C) DHWIO → (kpad, C) with K index ci*9 + ky*3 + kx."""
    c = w.shape[3]
    wk = jnp.zeros((kpad, c), dtype)
    flat = w[0].transpose(2, 0, 1, 3).reshape(9 * c, c)  # (ci, ky, kx) -> rows
    return wk.at[: 9 * c].set(flat.astype(dtype))


def rb2d_residual(x: jax.Array, w1, aff1, w2, aff2) -> jax.Array:
    """Fused ``resnet_block_2d`` eval forward.

    x: (B, N, H, W, C); w1/w2: (1,3,3,C,C); aff = (scale, shift) fp32 pairs.
    """
    b, n, h, wd, c = x.shape
    xs = x.reshape(b * n, h, wd, c).transpose(0, 3, 1, 2)
    out = rb2d_residual_cf(xs, w1, aff1, w2, aff2)
    return out.transpose(0, 2, 3, 1).reshape(b, n, h, wd, c)


def rb2d_residual_cf(xs: jax.Array, w1, aff1, w2, aff2) -> jax.Array:
    """Channel-first core: (BN, C, H, W) -> (BN, C, H, W)."""
    bn_, c, h, wd = xs.shape
    assert h % RB_H_TILE == 0
    kpad = -(-9 * c // 128) * 128  # pad K to the lane width
    wp = -(-wd // 128) * 128  # stored lane extents must be 128-multiples
    xp = jnp.pad(xs, ((0, 0), (0, 0), (2, 2), (2, 2 + wp - wd)))

    kernel = functools.partial(
        _rb2d_kernel, c=c, w_real=wd, high_precision=(xs.dtype == jnp.float32)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bn_, c, h, wp), xs.dtype),
        grid=(bn_, h // RB_H_TILE),
        in_specs=[
            pl.BlockSpec((1, c, h + 4, wp + 4), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, RB_H_TILE, wp), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        # fp32 scratches always: bf16's (16, 128) tiling rejects the T+2=18
        # sublane extents that fp32's (8, 128) tolerates
        scratch_shapes=[
            pltpu.VMEM((c, RB_H_TILE + 4, wp + 4), jnp.float32),
            pltpu.VMEM((kpad, RB_H_TILE + 2, wp), jnp.float32),
            pltpu.VMEM((kpad, RB_H_TILE, wp), jnp.float32),
            pltpu.VMEM((c, RB_H_TILE + 2, wp), jnp.float32),
        ],
    )(xp, _pack_conv33(w1, kpad, jnp.float32), _pack_conv33(w2, kpad, jnp.float32),
      aff1[0].reshape(c, 1).astype(jnp.float32), aff1[1].reshape(c, 1).astype(jnp.float32),
      aff2[0].reshape(c, 1).astype(jnp.float32), aff2[1].reshape(c, 1).astype(jnp.float32))
    return out[:, :, :, :wd]


def _srd_attn_kernel(f_ref, wn_ref, w1_ref, o_ref, cat, *, n: int, c: int):
    """Grid (B, tiles).  f_ref/o_ref (1, N*C, T, W); wn (3C pad, C) for the
    (3,1,1) conv (K index dn*C + ci); w1 (C pad, C) for the 1x1; cat
    (3C pad, T, W) scratch.  out = f + relu(W1 @ relu(Wn @ cat(f)))."""
    wd = o_ref.shape[3]
    tdim = o_ref.shape[2]
    kpad = cat.shape[0]
    if kpad > 3 * c:
        cat[3 * c :, :, :] = jnp.zeros((kpad - 3 * c, tdim, wd), cat.dtype)
    for ni in range(n):
        for dn in range(3):
            src = ni + dn - 1
            if 0 <= src < n:
                cat[dn * c : (dn + 1) * c, :, :] = f_ref[0, src * c : (src + 1) * c, :, :]
            else:
                cat[dn * c : (dn + 1) * c, :, :] = jnp.zeros((c, tdim, wd), cat.dtype)
        a = jax.lax.dot_general(
            wn_ref[:], cat[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(cat.dtype),
        )
        a = jnp.maximum(a, 0.0).astype(f_ref.dtype)
        a2 = jax.lax.dot_general(
            w1_ref[: c, :], a, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(a.dtype),
        )
        a2 = jnp.maximum(a2, 0.0)
        o_ref[0, ni * c : (ni + 1) * c, :, :] = (
            f_ref[0, ni * c : (ni + 1) * c, :, :].astype(jnp.float32) + a2
        ).astype(o_ref.dtype)


def srd_attention_residual(f: jax.Array, wn: jax.Array, w1: jax.Array) -> jax.Array:
    """Fused SRD focus-axis attention: ``f + relu(conv1x1(relu(conv311(f))))``.

    f: (B, N, H, W, C); wn: (3,1,1,C,C); w1: (1,1,1,C,C) (both bias-free).
    """
    b, n, h, wd, c = f.shape
    fs = f.transpose(0, 1, 4, 2, 3).reshape(b, n * c, h, wd)
    out = srd_attention_residual_cf(fs, wn, w1, n=n, c=c)
    return out.reshape(b, n, c, h, wd).transpose(0, 1, 3, 4, 2)


def srd_attention_residual_cf(fs: jax.Array, wn, w1, *, n: int, c: int) -> jax.Array:
    """Channel-first core: (B, N*C, H, W) -> same."""
    b, _, h, wd = fs.shape
    f = fs  # naming convenience for dtype below
    assert h % RB_H_TILE == 0
    kpad = -(-3 * c // 8) * 8
    wp = -(-wd // 128) * 128  # lane-extent constraint; padded cols stay zero
    if wp != wd:
        fs = jnp.pad(fs, ((0, 0), (0, 0), (0, 0), (0, wp - wd)))
    # wn (3,1,1,C,C): K index dn*C + ci
    wn_k = jnp.zeros((kpad, c), f.dtype)
    wn_k = wn_k.at[: 3 * c].set(wn[:, 0, 0].reshape(3 * c, c).astype(f.dtype))
    w1_k = w1[0, 0, 0].astype(f.dtype)  # (C, C)

    kernel = functools.partial(_srd_attn_kernel, n=n, c=c)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n * c, h, wp), f.dtype),
        grid=(b, h // RB_H_TILE),
        in_specs=[
            pl.BlockSpec((1, n * c, RB_H_TILE, wp), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n * c, RB_H_TILE, wp), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kpad, RB_H_TILE, wp), f.dtype)],
    )(fs, wn_k, w1_k)
    return out[:, :, :, :wd]


# ---------------------------------------------------------------------------
# Generic fused (3,3,3) conv + BN + (ReLU) — the hourglass workhorse
# (`Depth_Estimation_Network.py:240-284`).  Mixes the focus axis.  The deployed
# Mosaic rejects DMA destinations whose lane extent isn't exactly 128, so
# instead of manual HBM windows the kernel receives SIX aligned VMEM blocks of
# the same (N- and row-padded) input — {n, n+1, n+2} x {row-tile t, t+1} — and
# assembles each 3-slice, (T+2)-row window from their overlap-free pieces.
# Stride-1 only; strided encoder convs and deconvs stay on XLA.
# ---------------------------------------------------------------------------

C3_H_TILE = 16


def _conv333_kernel(xa0, xb0, xa1, xb1, xa2, xb2, w_ref, s_ref, b_ref, o_ref,
                    window, patches, *, cin: int, cout: int, relu: bool,
                    high_precision: bool):
    """Grid (B, N, tiles).

    xa/xb{dn}: (1, 1, Cin, T, WL+2) row blocks t and t+1 of slice n+dn of the
               padded volume (rows are offset by T-1 zeros, so the window's
               T+2 rows are xa's last two rows + all of xb)
    w_ref:     (3, 9*Cin pad, Cout), K = ci*9 + ky*3 + kx
    s_/b_ref:  (Cout, 1) fused BN affine
    o_ref:     (1, 1, Cout, T, WL)
    window:    (3, Cin, T+2, WL+2) scratch
    patches:   (9*Cin pad, T, WL) scratch
    """
    t_sz = C3_H_TILE
    wl = o_ref.shape[4]
    kpad = patches.shape[0]
    for dn, (xa, xb) in enumerate([(xa0, xb0), (xa1, xb1), (xa2, xb2)]):
        window[dn, :, 0:2, :] = xa[0, 0, :, t_sz - 2 : t_sz, :]
        window[dn, :, 2 : t_sz + 2, :] = xb[0, 0, :, :, :]

    if kpad > 9 * cin:
        patches[9 * cin :, :, :] = jnp.zeros((kpad - 9 * cin, t_sz, wl), patches.dtype)
    prec = jax.lax.Precision.HIGHEST if high_precision else None
    acc = jnp.zeros((cout, t_sz, wl), jnp.float32)
    for dn in range(3):
        for ci in range(cin):
            for ky in range(3):
                for kx in range(3):
                    patches[ci * 9 + ky * 3 + kx, :, :] = window[
                        dn, ci, ky : ky + t_sz, kx : kx + wl
                    ]
        acc = acc + jax.lax.dot_general(
            w_ref[dn], patches[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    y = acc * s_ref[:, 0][:, None, None] + b_ref[:, 0][:, None, None]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0, 0, :, :, :] = y.astype(o_ref.dtype)


def conv333_bn_relu_cf(xs: jax.Array, w: jax.Array, scale, shift, *,
                       relu: bool = True, batch: int) -> jax.Array:
    """Fused stride-1 ``Conv3d(k=3, p=1) + BN(eval) [+ ReLU]``, channel-first.

    xs: (B*N, Cin, H, W); w: (3, 3, 3, Cin, Cout) DHWIO. Returns (B*N, Cout, H, W).
    """
    bn_, cin, h, wd = xs.shape
    if wd > 256:
        # the deployed Mosaic crashes compiling this kernel beyond ~258-lane
        # blocks; split W with a 1-column halo (zero-pad semantics preserved:
        # the kept outputs only ever read real columns)
        mid = wd // 2
        left = conv333_bn_relu_cf(xs[..., : mid + 1], w, scale, shift,
                                  relu=relu, batch=batch)[..., :mid]
        right = conv333_bn_relu_cf(xs[..., mid - 1 :], w, scale, shift,
                                   relu=relu, batch=batch)[..., 1:]
        return jnp.concatenate([left, right], axis=-1)
    n = bn_ // batch
    cout = w.shape[4]
    t_sz = C3_H_TILE
    assert h % t_sz == 0
    wl = -(-wd // 128) * 128
    kpad = -(-9 * cin // 8) * 8
    # pads (all zeros, preserving conv semantics exactly):
    #   N: one slice each end;  rows: T-1 leading (so the T+2-row window of
    #   tile t spans exactly row-blocks t and t+1) + trailing to a multiple of
    #   T;  cols: 1 + (lane alignment)
    x5 = xs.reshape(batch, n, cin, h, wd)
    xp = jnp.pad(
        x5,
        ((0, 0), (1, 1), (0, 0), (t_sz - 1, 1), (1, 1 + wl - wd)),
    )

    wk = jnp.zeros((3, kpad, cout), jnp.float32)
    wk = wk.at[:, : 9 * cin, :].set(
        jnp.asarray(w, jnp.float32).transpose(0, 3, 1, 2, 4).reshape(3, 9 * cin, cout)
    )

    block = (1, 1, cin, t_sz, wl + 2)

    def spec(dn, dr):
        return pl.BlockSpec(
            block, lambda b, i, t, dn=dn, dr=dr: (b, i + dn, 0, t + dr, 0),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _conv333_kernel, cin=cin, cout=cout, relu=relu,
        high_precision=(xs.dtype == jnp.float32),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n, cout, h, wl), xs.dtype),
        grid=(batch, n, h // t_sz),
        in_specs=[
            spec(0, 0), spec(0, 1), spec(1, 0), spec(1, 1), spec(2, 0), spec(2, 1),
            pl.BlockSpec((3, kpad, cout), lambda b, i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda b, i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda b, i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cout, t_sz, wl),
                               lambda b, i, t: (b, i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, cin, t_sz + 2, wl + 2), xs.dtype),
            pltpu.VMEM((kpad, t_sz, wl), xs.dtype),
        ],
    )(xp, xp, xp, xp, xp, xp, wk.astype(jnp.float32),
      scale.reshape(cout, 1).astype(jnp.float32),
      shift.reshape(cout, 1).astype(jnp.float32))
    return out[:, :, :, :, :wd].reshape(bn_, cout, h, wd)


# ---------------------------------------------------------------------------
# Fused bilinear-upsample + softplus-soft-argmax depth head
# (`Depth_Estimation_Network.py:86-90,110-122`): cost (B, N, h, w) at 1/2-1/8
# resolution → depth (B, H, W), never materializing the upsampled (B, N, H, W)
# cost volume in HBM.  Row interpolation weights are built in-kernel from the
# affine align_corners=False map; column weights are a static matmul operand.
# ---------------------------------------------------------------------------

UP_H_TILE = 16


def _upsample_softargmax_kernel(xa, xb, wx_ref, fd_ref, o_ref, window,
                                *, n: int, f: int, h_in: int, tile: int):
    """Grid (B, out-row tiles).

    xa/xb:  (1, N, R, w) input row-blocks t, t+1 (rows edge-prepadded by R-1)
    wx_ref: (w pad, W) static column-interp matrix (transposed)
    fd_ref: (1, N) focus distances for this batch element
    o_ref:  (1, T, W)
    window: (N, R+2, w) scratch
    """
    t = pl.program_id(1)
    r = tile // f
    w_in = window.shape[2]
    w_out = o_ref.shape[2]

    window[:, 0:2, :] = xa[0, :, r - 2 : r, :]
    window[:, 2:, :] = xb[0, :, :, :]

    # row weights: out row o (global tT+o) samples src = (tT+o+0.5)/f - 0.5,
    # clipped; window row i holds global input row tR - 1 + i
    # tpu.iota only supports integer results; cast after
    o_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, r + 2), 0).astype(jnp.float32)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, r + 2), 1).astype(jnp.float32)
    src = (t * tile + o_idx + 0.5) / f - 0.5
    src = jnp.clip(src, 0.0, h_in - 1.0)
    rows = t * r - 1.0 + i_idx
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(src - rows))  # (T, R+2)

    num = jnp.zeros((tile, w_out), jnp.float32)
    den = jnp.zeros((tile, w_out), jnp.float32)
    for ni in range(n):
        up_rows = jax.lax.dot_general(
            wy, window[ni].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, w)
        up = jax.lax.dot_general(
            up_rows, wx_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, W)
        p = jax.nn.softplus(up) + 1e-6
        num = num + fd_ref[0, ni] * p
        den = den + p
    o_ref[0, :, :] = (num / den).astype(o_ref.dtype)


def upsample_softargmax(cost: jax.Array, focus_dists: jax.Array,
                        out_hw: tuple) -> jax.Array:
    """Fused ``softplus_argmax(upsample_bilinear(cost, out_hw), focus_dists)``.

    cost: (B, N, h, w); focus_dists: (B, N).  H/h must be an integer power-of-2
    factor in {2, 4, 8} with W/w equal (the model's head geometry).
    """
    from dffx.ops.resize import bilinear_matrix

    b, n, h_in, w_in = cost.shape
    h_out, w_out = out_hw
    f = h_out // h_in
    assert f in (2, 4, 8) and h_in * f == h_out and w_in * f == w_out, (cost.shape, out_hw)
    r = 8  # input row-block: Pallas requires sublane block dims % 8 == 0
    tile = r * f
    assert h_out % tile == 0

    # rows: prepad R-1 (edge) so the R+2-row window spans row-blocks t, t+1;
    # one trailing edge row + alignment
    rp_total = (h_out // tile + 1) * r
    xp = jnp.pad(cost, ((0, 0), (0, 0), (r - 1, rp_total - h_in - (r - 1)), (0, 0)),
                 mode="edge")
    wx = bilinear_matrix(w_in, w_out).T.copy()  # (w_in, W)
    block = (1, n, r, w_in)

    out = pl.pallas_call(
        functools.partial(_upsample_softargmax_kernel, n=n, f=f, h_in=h_in, tile=tile),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out), cost.dtype),
        grid=(b, h_out // tile),
        in_specs=[
            pl.BlockSpec(block, lambda b_, t: (b_, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda b_, t: (b_, 0, t + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, w_out), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b_, t: (b_, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, w_out), lambda b_, t: (b_, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, r + 2, w_in), cost.dtype)],
    )(xp, xp, jnp.asarray(wx), focus_dists.astype(jnp.float32))
    return out
