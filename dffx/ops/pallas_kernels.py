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
import os
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
KY_TAPS = 9 * 3  # ky, cin — kx is handled by sliced per-kx dots
KY_PAD = 32


def _fm_conv_kernel(xa_ref, xb_ref, w_ref, scale_ref, shift_ref, o_ref, window,
                    kyp, *, w_real: int):
    """Grid = (B*N slices, H row-tiles); channel-first layouts.

    xa/xb:    (1, 3, H_TILE, W) row blocks t and t+1 of the padded slice
              (rows lead-padded by 8, so tile t's H_TILE+16-row window is all
              of block t plus the first 16 rows of block t+1) — streaming two
              blocks bounds VMEM by the tile, not by H*W, so any eval
              resolution fits (round-1's whole-slice BlockSpec forced the
              384^2 area cap)
    w_ref:    (9, KY_PAD, 8)  leading dim = kx; K index = ky*3 + cin
    scale/shift: (8, 1) fused eval-BN affine (fp32)
    o_ref:    (1, 8, H_TILE, W) — one row tile
    window:   (3, H_TILE + 16, W) scratch — the tile's input rows
    kyp:      (KY_PAD, H_TILE, W) scratch, input dtype

    ky-shift-only im2col (round 3): patches are built for the 9 ky row
    shifts ONLY (27 copies vs the old 9x9x3 = 243 — the full patch matrix
    was copy-bound at batch 1), and the 9 dilated kx column shifts come
    from lane-rolling the per-kx dot outputs with wrap-around masked at
    the true image edges (exactly the conv's zero-pad semantics: columns
    are NOT host-padded, so every operand keeps the 128-multiple lane
    extent Mosaic requires of dot inputs).  Same MACs — K splits 256→9x32.
    """
    w = o_ref.shape[3]
    # all copies below are static — Mosaic (as deployed here) crashes on
    # kernels with many (>~80) dynamic-base strided copies
    window[:, :H_TILE, :] = xa_ref[0]
    window[:, H_TILE:, :] = xb_ref[0, :, :16, :]
    # zero the K padding rows: scratch memory is uninitialized and 0 * garbage
    # (or NaN) would poison the fp32 accumulation
    kyp[KY_TAPS:, :, :] = jnp.zeros((KY_PAD - KY_TAPS, H_TILE, w), kyp.dtype)
    for ky in range(9):
        for c in range(3):
            kyp[ky * 3 + c, :, :] = window[c, 2 * ky : 2 * ky + H_TILE, :]
    prec = _dot_precision(kyp.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (H_TILE, w), 1)[None]
    acc = jnp.zeros((8, H_TILE, w), jnp.float32)
    for kx in range(9):
        d = jax.lax.dot_general(
            w_ref[kx],
            kyp[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (8, H_TILE, W); tap kx contributes d[j + s], s = 2*(kx - 4)
        s = 2 * (kx - 4)
        if s == 0:
            acc = acc + d
        elif s < 0:
            acc = acc + jnp.where(col >= -s, pltpu.roll(d, -s, axis=2), 0.0)
        else:
            acc = acc + jnp.where(
                col <= w_real - 1 - s, pltpu.roll(d, w - s, axis=2), 0.0
            )
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
    wl = -(-width // 128) * 128  # dot operands need 128-multiple lane extents
    # rows: lead-pad 8 (the dilated conv's halo) and tail-pad so (H + T) rows
    # split into (H/T + 1) full blocks — tile t's window spans blocks t, t+1;
    # columns are NOT conv-padded: kx halos are in-kernel rolls+masks, and the
    # wl - width lane-alignment columns are masked dead weight sliced off below
    xp = jnp.pad(xs, ((0, 0), (0, 0), (8, H_TILE - 8), (0, wl - width)))

    # (9, KY_PAD, 8): leading dim kx, K index ky*3 + cin
    wk = jnp.zeros((9, KY_PAD, 8), w.dtype)
    wk = wk.at[:, :KY_TAPS].set(w[0].transpose(1, 0, 2, 3).reshape(9, KY_TAPS, 8))

    row_block = (1, 3, H_TILE, wl)
    out = pl.pallas_call(
        functools.partial(_fm_conv_kernel, w_real=width),
        out_shape=jax.ShapeDtypeStruct((bn_, 8, h, wl), xs.dtype),
        grid=(bn_, h // H_TILE),
        in_specs=[
            pl.BlockSpec(row_block, lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(row_block, lambda i, t: (i, 0, t + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, KY_PAD, 8), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, H_TILE, wl), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, H_TILE + 16, wl), xs.dtype),
            pltpu.VMEM((KY_PAD, H_TILE, wl), xs.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bn_ * h * width * KY_TAPS * 9 * 8,
            bytes_accessed=xs.size * xs.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(xp, xp, wk.astype(xs.dtype), scale.reshape(8, 1), shift.reshape(8, 1))
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


def _kx3_accum(w_ref, kyp, rows, wd, w_real, prec):
    """Shared 3-tap kx accumulation for the (3,3) conv kernels (rb2d and the
    motion-head chain): ``kyp`` (K, rows, W) already holds the ky/ci row
    shifts, so each kx tap is one dot; tap kx contributes ``d[j + kx - 1]``,
    realized for kx=0/2 by rolling the dot *output* one lane with wrap-around
    masked at the true image edges.  The conv input is zero beyond ``w_real``
    (host mask or pad), so a masked roll IS the conv's zero-pad semantics, and
    no operand ever needs a non-128-multiple lane extent."""
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, wd), 1)[None]

    def dotk(kx):
        return jax.lax.dot_general(
            w_ref[kx], kyp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (Cout, rows, W)

    a = dotk(1)
    a = a + jnp.where(col >= 1, pltpu.roll(dotk(0), 1, axis=2), 0.0)
    a = a + jnp.where(col <= w_real - 2, pltpu.roll(dotk(2), wd - 1, axis=2), 0.0)
    return a


def _rb2d_kernel(xa_ref, xb_ref, w1_ref, w2_ref, s1_ref, b1_ref, s2_ref, b2_ref,
                 o_ref, window, kyp1, kyp2, r1, *, c: int, w_real: int,
                 high_precision: bool):
    """Grid (B*N, tiles).  xa/xb (1, C, RB_H_TILE, W): row blocks t and t+1
    of the padded slice (rows lead-padded by 2, so the T+4-row window is block
    t plus the first 4 rows of block t+1 — streaming bounds VMEM by the tile,
    not the image, lifting round-1's area cap); o_ref (1, C, RB_H_TILE, W);
    w1/w2 (3, 3C, C) with leading dim kx and K index ky*C + ci; s/b refs =
    bn1/bn2 fused scale/shift (C, 1); window (C, T+4, W);
    kyp1 (3C, T+2, W); kyp2 (3C, T, W); r1 (C, T+2, W).

    ky-shift-only im2col (round 3): patches hold the 3 ky row shifts only
    (3C copies vs the old 9C), and the kx column shifts are lane rolls of
    the per-kx dot *outputs* with wrap-around masked at the true image
    edges — once per conv instead of once per channel, and with columns
    never host-padded every dot operand keeps the 128-multiple lane extent
    Mosaic requires.  Same MACs (K splits 9C -> 3x3C); the per-tile VMEM
    copy volume drops ~2.5x, which is what bounds these kernels at batch 1.
    """
    wd = o_ref.shape[3]
    t = pl.program_id(1)
    window[:, : RB_H_TILE, :] = xa_ref[0].astype(window.dtype)
    window[:, RB_H_TILE :, :] = xb_ref[0, :, :4, :].astype(window.dtype)
    prec = jax.lax.Precision.HIGHEST if high_precision else None

    # conv1 on (T+2 rows): rows give conv2 its vertical halo locally
    for ky in range(3):
        for ci in range(c):
            kyp1[ky * c + ci, :, :] = window[ci, ky : ky + RB_H_TILE + 2, :]

    acc = _kx3_accum(w1_ref, kyp1[:], RB_H_TILE + 2, wd, w_real, prec)
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

    # conv2 on (T, W); r1 is zero beyond the true extent, so the kx column
    # halo is realized by rolling the kx=0/2 dot outputs one lane with
    # wrap-around masked off at the true edges
    for ky in range(3):
        for ci in range(c):
            kyp2[ky * c + ci, :, :] = r1[ci, ky : ky + RB_H_TILE, :]
    acc2 = _kx3_accum(w2_ref, kyp2[:], RB_H_TILE, wd, w_real, prec)
    y2 = acc2 * s2_ref[:, 0][:, None, None] + b2_ref[:, 0][:, None, None]
    center = window[:, 2 : 2 + RB_H_TILE, :].astype(jnp.float32)
    o_ref[0, :, :, :] = jnp.maximum(center + y2, 0.0).astype(o_ref.dtype)


def _pack_conv33_kx(w: jax.Array, dtype, kpad: int = None, cout_pad: int = None) -> jax.Array:
    """(1,3,3,Cin,Cout) DHWIO → (3, kpad, cout_pad): leading dim kx, K = ky*Cin + ci."""
    cin, cout = w.shape[3], w.shape[4]
    # (ky, kx, ci, co) -> (kx, ky, ci, co) -> (kx, ky*ci, co)
    flat = w[0].transpose(1, 0, 2, 3).reshape(3, 3 * cin, cout)
    if kpad is None and cout_pad is None:
        return flat.astype(dtype)
    wk = jnp.zeros((3, kpad or 3 * cin, cout_pad or cout), dtype)
    return wk.at[:, : 3 * cin, :cout].set(flat.astype(dtype))


def rb2d_residual(x: jax.Array, w1, aff1, w2, aff2) -> jax.Array:
    """Fused ``resnet_block_2d`` eval forward.

    x: (B, N, H, W, C); w1/w2: (1,3,3,C,C); aff = (scale, shift) fp32 pairs.
    """
    b, n, h, wd, c = x.shape
    xs = x.reshape(b * n, h, wd, c).transpose(0, 3, 1, 2)
    out = rb2d_residual_cf(xs, w1, aff1, w2, aff2)
    return out.transpose(0, 2, 3, 1).reshape(b, n, h, wd, c)


#: widest W each channel count may take in one rb2d pallas_call; beyond this,
#: split W with the two-conv stack's 2-column halo.  Sized for the pre-round-3
#: (9C, T+2, W) patch scratches; the ky-shift rewrite shrank scratch ~2.5x, so
#: wider tiles may now fit — re-measure IN-CONTEXT on chip before raising
#: (the caps also encode Mosaic compile limits, not just VMEM).
_RB_W_CAP = {8: 384, 16: 384, 32: 256}


def _w_cap(table: dict, c: int, default: int, env: str) -> int:
    """Per-channel W-split cap, overridable via ``env`` (int, applies to every
    channel count) for on-chip sweeps — the cap values above were tuned before
    the round-3 kernel changes and are flagged for re-measurement."""
    v = os.environ.get(env)
    return int(v) if v else table.get(c, default)


def rb2d_residual_cf(xs: jax.Array, w1, aff1, w2, aff2) -> jax.Array:
    """Channel-first core: (BN, C, H, W) -> (BN, C, H, W)."""
    bn_, c, h, wd = xs.shape
    assert h % RB_H_TILE == 0
    cap = _w_cap(_RB_W_CAP, c, 256, "DFFX_RB_W_CAP")
    mid = max(wd // 2 // 128, 1) * 128
    # mid + 2 < wd guards termination: a chunk must be strictly narrower than
    # its parent (chunk width is mid + the 2-column halo), else a cap within
    # a halo of wd would recurse forever
    if wd > cap and mid + 2 < wd:
        # split W with the stacked 3x3 pair's 2-column halo; kept outputs
        # only ever read real columns, so zero-pad semantics are preserved
        left = rb2d_residual_cf(xs[..., : mid + 2], w1, aff1, w2, aff2)[..., :mid]
        right = rb2d_residual_cf(xs[..., mid - 2 :], w1, aff1, w2, aff2)[..., 2:]
        return jnp.concatenate([left, right], axis=-1)
    wp = -(-wd // 128) * 128  # dot operands need 128-multiple lane extents
    # rows: lead-pad 2 (the conv halo) and tail-pad so (H + T) rows split into
    # (H/T + 1) full blocks — tile t's window is block t + 4 rows of block t+1;
    # columns are NOT padded: kx halos are in-kernel rolls+masks
    xp = jnp.pad(xs, ((0, 0), (0, 0), (2, RB_H_TILE - 2), (0, wp - wd)))

    kernel = functools.partial(
        _rb2d_kernel, c=c, w_real=wd, high_precision=(xs.dtype == jnp.float32)
    )
    row_block = (1, c, RB_H_TILE, wp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bn_, c, h, wp), xs.dtype),
        grid=(bn_, h // RB_H_TILE),
        in_specs=[
            pl.BlockSpec(row_block, lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(row_block, lambda i, t: (i, 0, t + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * c, c), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * c, c), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((c, RB_H_TILE + 4, wp), jnp.float32),
            pltpu.VMEM((3 * c, RB_H_TILE + 2, wp), jnp.float32),
            pltpu.VMEM((3 * c, RB_H_TILE, wp), jnp.float32),
            pltpu.VMEM((c, RB_H_TILE + 2, wp), jnp.float32),
        ],
    )(xp, xp, _pack_conv33_kx(w1, jnp.float32), _pack_conv33_kx(w2, jnp.float32),
      aff1[0].reshape(c, 1).astype(jnp.float32), aff1[1].reshape(c, 1).astype(jnp.float32),
      aff2[0].reshape(c, 1).astype(jnp.float32), aff2[1].reshape(c, 1).astype(jnp.float32))
    return out[:, :, :, :wd]


# ---------------------------------------------------------------------------
# FlowNetwork motion-head chain (`End_to_End/End_to_End.py:33-61`): four
# stacked (1,3,3) convs — convbn+ReLU x3 then a biased conv to 3 channels —
# at FULL resolution with 16-18 channels.  XLA lowers each conv separately at
# ~1% MFU (tiny channel counts); this kernel runs the whole chain per row
# tile with intermediates in VMEM: every conv takes its ky halo from row
# shifts and its kx halo from lane rolls of the per-kx dot outputs
# (interior chunk edges are discarded via the host splitter's 4-column
# overlap; true-edge zero-padding is realized by masking each intermediate
# to the real image extent, which is exactly conv-chain zero-pad semantics).
# ---------------------------------------------------------------------------

MH_H_TILE = 16


def _motion_head_kernel(xa_ref, xb_ref, w0_ref, w1_ref, w2_ref, w3_ref,
                        s0_ref, b0_ref, s1_ref, b1_ref, s2_ref, b2_ref,
                        bias3_ref, o_ref, window, kyp0, kypc, y0, y1, *,
                        cin: int, c: int, w_real: int, h_real: int,
                        high_precision: bool):
    """Grid (B*N, H tiles).  xa/xb (1, cin, T, W): row blocks t and t+1 of
    the 4-row lead-padded slice; window (cin, T+8, W); conv_k's
    output rows map to image row ``t*T + r - (3-k)`` and each intermediate
    is masked to the true image extent before feeding the next conv.
    kyp0 (3*cin pad, T+6, W) holds conv0's ky row shifts;
    kypc (3c, T+4, W) is reused by convs 1-3; y0/y1 (c, ., W) fp32
    ping-pong.  o_ref (1, 3, T, W).  All weight refs are (3, K, Cout) with
    leading dim kx and K = ky*Cin + ci.

    ky-shift-only im2col (round 3, same as _fm_conv_kernel/_rb2d_kernel):
    patches hold row shifts only; the kx column shifts are one lane roll +
    edge mask per kx dot output (every conv input is zero beyond the true
    image — host right-pad for conv0, explicit store_masked for convs 1-3 —
    making roll wrap-around equal to zero-padding).  Columns are never
    host-padded, so all dot operands keep Mosaic's required 128-multiple
    lane extents.  Cuts per-tile VMEM copy volume ~2.5x at identical MACs."""
    wd = o_ref.shape[3]
    t = pl.program_id(1)
    trows = o_ref.shape[2]
    prec = jax.lax.Precision.HIGHEST if high_precision else None
    k0 = 3 * cin
    k0p = kyp0.shape[0]

    window[:, :trows, :] = xa_ref[0].astype(window.dtype)
    window[:, trows:, :] = xb_ref[0, :, :8, :].astype(window.dtype)

    # conv0: ky shifts from the window; kx via rolls of the dot outputs
    r0 = trows + 6
    if k0p > k0:
        kyp0[k0:, :, :] = jnp.zeros((k0p - k0, r0, wd), kyp0.dtype)
    for ky in range(3):
        for ci in range(cin):
            kyp0[ky * cin + ci, :, :] = window[ci, ky : ky + r0, :]
    acc = _kx3_accum(w0_ref, kyp0[:], r0, wd, w_real, prec)

    def store_masked(buf, arr, rows, off):
        # zero everything outside the true image: that IS the next conv's
        # zero-padding (y_k is defined 0 beyond the image in the reference)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, wd), 0) + t * trows - off
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, wd), 1)
        valid = (row >= 0) & (row < h_real) & (col < w_real)
        buf[:, :rows, :] = jnp.where(valid[None], arr, 0.0).astype(buf.dtype)

    y = jnp.maximum(acc * s0_ref[:, 0][:, None, None]
                    + b0_ref[:, 0][:, None, None], 0.0)
    store_masked(y0, y, r0, 3)

    def ky_conv(src, rows_out, w_ref):
        # src rows are zero-masked beyond the true image, so the kx column
        # halo is a roll of the kx=0/2 dot outputs with wrap masked at edges
        for ky in range(3):
            for ci in range(c):
                kypc[ky * c + ci, :rows_out, :] = src[
                    ci, ky : ky + rows_out, :].astype(kypc.dtype)
        return _kx3_accum(w_ref, kypc[:, :rows_out, :], rows_out, wd, w_real, prec)

    r1 = trows + 4
    a = ky_conv(y0, r1, w1_ref)
    y = jnp.maximum(a * s1_ref[:, 0][:, None, None]
                    + b1_ref[:, 0][:, None, None], 0.0)
    store_masked(y1, y, r1, 2)

    r2 = trows + 2
    a = ky_conv(y1, r2, w2_ref)
    y = jnp.maximum(a * s2_ref[:, 0][:, None, None]
                    + b2_ref[:, 0][:, None, None], 0.0)
    store_masked(y0, y, r2, 1)  # ping-pong back into y0

    a = ky_conv(y0, trows, w3_ref)  # (8, T, W)
    out3 = a[:3] + bias3_ref[:3, 0][:, None, None]
    o_ref[0, :, :, :] = out3.astype(o_ref.dtype)


def motion_head_conv_chain(x, w0, aff0, w1, aff1, w2, aff2, w3, bias3):
    """Fused eval motion head (pre-pooling): ``conv6(relu(bn2(conv4(relu(
    bn1(conv2(relu(bn0(conv0(x))))))))))`` with all convs (1,3,3) pad 1.

    x: (B, N, H, W, cin); w0 (1,3,3,cin,c); w1/w2 (1,3,3,c,c);
    w3 (1,3,3,c,3); aff = fp32 (scale, shift); bias3 (3,).
    Returns (B, N, H, W, 3) in x.dtype.
    """
    b, n, h, wd, cin = x.shape
    xs = x.reshape(b * n, h, wd, cin).transpose(0, 3, 1, 2)
    out = motion_head_conv_chain_cf(xs, w0, aff0, w1, aff1, w2, aff2, w3, bias3)
    return out.transpose(0, 2, 3, 1).reshape(b, n, h, wd, 3)


#: widest W chunk per mid-channel count.  Sized for the pre-round-3
#: (9*cin, T+6, W) patch scratch; the ky-shift rewrite shrank it 3x, so wider
#: chunks may fit (fewer splits at the 1088-wide E2E shape) — re-measure
#: IN-CONTEXT on chip before raising.
_MH_W_CAP = {16: 256, 32: 128}


def motion_head_conv_chain_cf(xs, w0, aff0, w1, aff1, w2, aff2, w3, bias3):
    """Channel-first core: (BN, cin, H, W) -> (BN, 3, H, W)."""
    bn_, cin, h, wd = xs.shape
    c = w0.shape[4]
    cap = _w_cap(_MH_W_CAP, c, 128, "DFFX_MH_W_CAP")
    mid = max(wd // 2 // 128, 1) * 128
    # mid + 4 < wd: same termination guard as rb2d (chunk = mid + 4-col halo)
    if wd > cap and mid + 4 < wd:
        # 4-conv chain: 4 contaminated columns per interior chunk edge
        # (conv0's window uses zero pad instead of neighbor data, +1/conv)
        left = motion_head_conv_chain_cf(
            xs[..., : mid + 4], w0, aff0, w1, aff1, w2, aff2, w3, bias3
        )[..., :mid]
        right = motion_head_conv_chain_cf(
            xs[..., mid - 4 :], w0, aff0, w1, aff1, w2, aff2, w3, bias3
        )[..., 4:]
        return jnp.concatenate([left, right], axis=-1)
    trows = MH_H_TILE
    hp = -(-h // trows) * trows
    wp = -(-wd // 128) * 128
    # rows: lead-pad 4 (chain halo), tail-pad so (Hp + T) rows = (Hp/T + 1)
    # full blocks; columns are NOT padded — kx halos are in-kernel rolls+masks
    xp = jnp.pad(xs, ((0, 0), (0, 0), (4, trows - 4 + hp - h),
                      (0, wp - wd)))

    k0p = -(-3 * cin // 8) * 8
    kc = 3 * c
    f32 = jnp.float32
    kernel = functools.partial(
        _motion_head_kernel, cin=cin, c=c, w_real=wd, h_real=h,
        high_precision=(xs.dtype == jnp.float32),
    )
    row_block = (1, cin, trows, wp)
    vec = lambda a: a.reshape(-1, 1).astype(f32)  # noqa: E731
    b3 = jnp.zeros((8, 1), f32).at[:3, 0].set(bias3.astype(f32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bn_, 3, hp, wp), xs.dtype),
        grid=(bn_, hp // trows),
        in_specs=[
            pl.BlockSpec(row_block, lambda i, t: (i, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(row_block, lambda i, t: (i, 0, t + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k0p, c), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kc, c), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kc, c), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kc, 8), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((c, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM)] * 6
          + [pl.BlockSpec((8, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, trows, wp), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cin, trows + 8, wp), f32),
            pltpu.VMEM((k0p, trows + 6, wp), f32),
            pltpu.VMEM((kc, trows + 4, wp), f32),
            pltpu.VMEM((c, trows + 6, wp), f32),
            pltpu.VMEM((c, trows + 4, wp), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bn_ * h * wd * 9 * (cin * c + 2 * c * c + c * 3),
            bytes_accessed=xs.size * xs.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(xp, xp,
      _pack_conv33_kx(w0, f32, kpad=k0p), _pack_conv33_kx(w1, f32),
      _pack_conv33_kx(w2, f32), _pack_conv33_kx(w3, f32, cout_pad=8),
      vec(aff0[0]), vec(aff0[1]), vec(aff1[0]), vec(aff1[1]),
      vec(aff2[0]), vec(aff2[1]), b3)
    return out[:, :, :h, :wd]


# ---------------------------------------------------------------------------
# FlowNetwork feature-pyramid chain (`End_to_End/End_to_End.py:135-145`):
# K consecutive STRIDE-1 ``resnet_block_2d_OF`` blocks —
#   relu(short_1x1(x) + bn2(conv2(relu(bn1(conv1(x))))))
# with bias-free convs — fused per row tile with every intermediate in VMEM.
# XLA runs the full-res pyramid level (3→8→8 ch at 608x1088) at ~1.3 TFLOP/s
# (M=8 MXU fill + one HBM roundtrip per conv); the fused chain reads the
# input once and writes the output once.  Same ky-shift im2col scheme as
# the other (3,3) kernels: patches hold ky row shifts only, kx comes from
# lane rolls of per-kx dot outputs, true-edge zero-pad realized by masking
# each intermediate to the real image extent (exact: every op in the block
# is bias-free, so outside-image values are identically zero).
# ---------------------------------------------------------------------------

RBOF_H_TILE = 16


def _rb_of_kernel(*refs, chans, kpads, w_real: int, h_real: int,
                  high_precision: bool):
    """Grid (B*N, H tiles).  refs = xa, xb, then per block
    (w1, w2, ws, s1, b1, s2, b2), then o_ref, then scratches
    (window, kyp, y0, ya, yb).

    xa/xb (1, cin0, T, W): row blocks t and t+1 of the R-row lead-padded
    slice (R = 2*len(chans), the chain's receptive radius).  Weight refs:
    w1 (3, kpad_k, cout) / w2 (3, 3*cout, cout) with leading dim kx and
    K = ky*cin + ci; ws (cinp_k, cout) for the 1x1 projection shortcut;
    s/b = fused BN affines (cout, 1).  window (cinp0, T+2R, W) holds the
    tile's input rows (channels zero-padded to a sublane multiple for the
    block-0 shortcut dot); kyp is the shared ky-shift patch scratch; y0 the
    conv1 intermediate; ya/yb ping-pong the block outputs."""
    nblk = len(chans)
    xa_ref, xb_ref = refs[0], refs[1]
    o_ref = refs[2 + 7 * nblk]
    window, kyp, y0, ya, yb = refs[3 + 7 * nblk:]
    trows = o_ref.shape[2]
    wd = o_ref.shape[3]
    t = pl.program_id(1)
    prec = jax.lax.Precision.HIGHEST if high_precision else None
    r = 2 * nblk

    cin0 = xa_ref.shape[1]
    cinp0 = window.shape[0]
    window[:cin0, :trows, :] = xa_ref[0].astype(window.dtype)
    window[:cin0, trows:, :] = xb_ref[0, :, : 2 * r, :].astype(window.dtype)
    if cinp0 > cin0:
        # zero the channel padding: the block-0 shortcut dot contracts over
        # cinp0 and scratch memory is uninitialized
        window[cin0:, :, :] = jnp.zeros(
            (cinp0 - cin0, trows + 2 * r, wd), window.dtype)

    def store_masked(buf, arr, rows, off):
        # zero everything outside the true image: every op in the block is
        # bias-free, so that IS the next conv's zero-pad semantics
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, wd), 0) + t * trows - off
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, wd), 1)
        valid = (row >= 0) & (row < h_real) & (col < w_real)
        buf[: arr.shape[0], :rows, :] = jnp.where(
            valid[None], arr, 0.0).astype(buf.dtype)

    src, src_rows, src_off = window, trows + 2 * r, r
    outbufs = (ya, yb)
    for k, (cin, cout) in enumerate(chans):
        w1_ref, w2_ref, ws_ref, s1, b1, s2, b2 = refs[2 + 7 * k : 2 + 7 * (k + 1)]
        kpad = kpads[k]
        r1 = src_rows - 2
        if kpad > 3 * cin:
            kyp[3 * cin : kpad, :r1, :] = jnp.zeros(
                (kpad - 3 * cin, r1, wd), kyp.dtype)
        for ky in range(3):
            for ci in range(cin):
                kyp[ky * cin + ci, :r1, :] = src[ci, ky : ky + r1, :]
        acc = _kx3_accum(w1_ref, kyp[:kpad, :r1, :], r1, wd, w_real, prec)
        yv = jnp.maximum(
            acc * s1[:, 0][:, None, None] + b1[:, 0][:, None, None], 0.0)
        store_masked(y0, yv, r1, src_off - 1)

        r2 = src_rows - 4
        for ky in range(3):
            for ci in range(cout):
                kyp[ky * cout + ci, :r2, :] = y0[ci, ky : ky + r2, :]
        acc2 = _kx3_accum(w2_ref, kyp[: 3 * cout, :r2, :], r2, wd, w_real, prec)
        # 1x1 projection shortcut on the src center rows (same extent as
        # conv2's output); src is zero outside the image, so no masking
        # is needed before the add
        ks = ws_ref.shape[0]
        sv = jax.lax.dot_general(
            ws_ref[:], src[:ks, 2 : 2 + r2, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        out = jnp.maximum(
            acc2 * s2[:, 0][:, None, None] + b2[:, 0][:, None, None] + sv, 0.0)
        if k == nblk - 1:
            o_ref[0, :, :, :] = out.astype(o_ref.dtype)  # r2 == T here
        else:
            buf = outbufs[k % 2]
            store_masked(buf, out, r2, src_off - 2)
            src, src_rows, src_off = buf, r2, src_off - 2


def rb_of_chain(x: jax.Array, blocks) -> jax.Array:
    """Fused eval forward of consecutive stride-1 ``resnet_block_2d_OF``s.

    x: (B, N, H, W, cin0).  blocks: tuple of (w1, aff1, w2, aff2, wshort)
    per block — w1 (1,3,3,cin,cout), w2 (1,3,3,cout,cout), wshort
    (1,1,1,cin,cout) all bias-free, aff = fp32 (scale, shift) fused-BN pairs.
    Returns (B, N, H, W, cout_last) in x.dtype.
    """
    b, n, h, wd, cin = x.shape
    xs = x.reshape(b * n, h, wd, cin).transpose(0, 3, 1, 2)
    out = rb_of_chain_cf(xs, blocks)
    cout = out.shape[1]
    return out.transpose(0, 2, 3, 1).reshape(b, n, h, wd, cout)


#: widest W chunk per max-channel count; beyond this, split W with the
#: chain's 2-convs-per-block column halo.  c<=8 fits single-chunk at the
#: 1088-wide E2E shape (~5 MB VMEM); sweepable via DFFX_RBOF_W_CAP.
_RBOF_W_CAP = {8: 1152, 16: 640, 32: 384}


def rb_of_chain_cf(xs: jax.Array, blocks) -> jax.Array:
    """Channel-first core: (BN, cin0, H, W) -> (BN, cout_last, H, W)."""
    bn_, cin0, h, wd = xs.shape
    chans = tuple((blk[0].shape[3], blk[0].shape[4]) for blk in blocks)
    for (ci, co), blk in zip(chans, blocks):
        assert blk[2].shape[3:] == (co, co) and blk[4].shape[3:] == (ci, co)
    cmax = max(co for _, co in chans)
    cap = _w_cap(_RBOF_W_CAP, cmax, 384, "DFFX_RBOF_W_CAP")
    halo = 2 * len(blocks)  # 1 contaminated column per conv per chunk edge
    mid = max(wd // 2 // 128, 1) * 128
    # mid + halo < wd: termination guard — a chunk must be strictly narrower
    # than its parent (same as rb2d/mhead)
    if wd > cap and mid + halo < wd:
        left = rb_of_chain_cf(xs[..., : mid + halo], blocks)[..., :mid]
        right = rb_of_chain_cf(xs[..., mid - halo :], blocks)[..., halo:]
        return jnp.concatenate([left, right], axis=-1)

    trows = RBOF_H_TILE
    r = 2 * len(blocks)
    hp = -(-h // trows) * trows
    wp = -(-wd // 128) * 128
    # rows: lead-pad R (chain halo), tail-pad so (Hp + T) rows = (Hp/T + 1)
    # full blocks; columns are NOT padded — kx halos are in-kernel rolls+masks
    xp = jnp.pad(xs, ((0, 0), (0, 0), (r, trows - r + hp - h), (0, wp - wd)))

    f32 = jnp.float32
    cinp0 = -(-cin0 // 8) * 8
    kpads = tuple(-(-3 * ci // 8) * 8 for ci, _ in chans)
    vec = lambda a: a.reshape(-1, 1).astype(f32)  # noqa: E731

    operands = [xp, xp]
    in_specs = [
        pl.BlockSpec((1, cin0, trows, wp), lambda i, t: (i, 0, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin0, trows, wp), lambda i, t: (i, 0, t + 1, 0),
                     memory_space=pltpu.VMEM),
    ]
    for k, ((ci, co), (w1, aff1, w2, aff2, ws)) in enumerate(zip(chans, blocks)):
        cinp = cinp0 if k == 0 else ci
        wsp = jnp.zeros((cinp, co), f32).at[:ci].set(
            ws[0, 0, 0].astype(f32))
        operands += [
            _pack_conv33_kx(w1, f32, kpad=kpads[k]), _pack_conv33_kx(w2, f32),
            wsp, vec(aff1[0]), vec(aff1[1]), vec(aff2[0]), vec(aff2[1]),
        ]
        in_specs += [
            pl.BlockSpec((3, kpads[k], co), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * co, co), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cinp, co), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((co, 1), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)] * 4

    max_kpad = max(max(kpads), 3 * cmax)
    kernel = functools.partial(
        _rb_of_kernel, chans=chans, kpads=kpads, w_real=wd, h_real=h,
        high_precision=(xs.dtype == jnp.float32),
    )
    cout_last = chans[-1][1]
    macs = sum(9 * ci * co + 9 * co * co + ci * co for ci, co in chans)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bn_, cout_last, hp, wp), xs.dtype),
        grid=(bn_, hp // trows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cout_last, trows, wp), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cinp0, trows + 2 * r, wp), f32),
            pltpu.VMEM((max_kpad, trows + 2 * r - 2, wp), f32),
            pltpu.VMEM((cmax, trows + 2 * r - 2, wp), f32),
            pltpu.VMEM((cmax, trows + 2 * r - 4, wp), f32),
            pltpu.VMEM((cmax, trows + 2 * r - 4, wp), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bn_ * h * wd * macs,
            bytes_accessed=xs.size * xs.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(*operands)
    return out[:, :, :h, :wd]


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
    # the attention is pointwise in space — chunk W with no halo to keep the
    # (N*C, T, W) blocks inside VMEM at wide eval shapes.  Budget: the in/out
    # blocks are double-buffered, so 4 * (N*C * T * wp * 2B) must stay well
    # under the 16 MB scoped-vmem limit (Middlebury half-res N*C=240 at
    # wp=512 hit 19.3 MB without the channel term).
    wp_now = -(-wd // 128) * 128
    if (wd > 512 or n * c * wp_now > 64 * 1024) and wd > 128:
        # wd <= 128 cannot split further (one lane tile) — fall through and
        # let the kernel try; a clean resource error beats infinite recursion
        mid = max(wd // 2 // 128, 1) * 128
        return jnp.concatenate(
            [srd_attention_residual_cf(fs[..., :mid], wn, w1, n=n, c=c),
             srd_attention_residual_cf(fs[..., mid:], wn, w1, n=n, c=c)],
            axis=-1,
        )
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
