"""Exact space-to-depth ("packed") evaluation of the full-resolution tail.

The final decoder stage — ``deconv_3`` + the full-res ``dres4`` hourglass +
``classif3`` (reference `Depth_Estimation_Network.py:105-108,:265-284`) — runs
3D convs with 8/16 channels at full resolution, which tile the MXU at a few
percent and dominate batch-1 latency (~13 of 33 ms at 384²).  Here the same
math is evaluated on the half-resolution lattice with 4x the channels:

* a full-res tensor ``(B, N, H, W, C)`` is stored packed as
  ``(B, N, H/2, W/2, 4C)`` with channel index ``phase * C + c`` where
  ``phase = (y % 2) * 2 + (x % 2)``;
* every conv/deconv weight is scattered into an equivalent kernel over the
  packed lattice (derivations in each transform's docstring).  The transforms
  are EXACT — packed evaluation is a reparameterization, not an approximation
  — and are verified against the unpacked path by ``tests/test_packed.py``.

Stride-1 3x3 convs expand to (3,2,2)->(3,3,3) packed kernels with 4x channels
(the four output phases need a 3-cell union support, so the dense packed
kernel carries structural zeros — 4x the FLOPs, but at 32-64 channels XLA's
conv lowering is far more than 4x as efficient as at 8-16).  Strided convs and
deconvs map with no expansion (2-cell support).

Eval-mode only: BatchNorm is applied as the folded affine, tiled per phase.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from dffx.ops.pallas_kernels import bn_fused_affine

_DIMS = ("NDHWC", "DHWIO", "NDHWC")


def pack(x: jax.Array) -> jax.Array:
    """(B, N, H, W, C) -> (B, N, H/2, W/2, 4C), channel = phase * C + c."""
    b, n, h, w, c = x.shape
    x = x.reshape(b, n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, n, h // 2, w // 2, 4 * c)


def unpack(x: jax.Array) -> jax.Array:
    """Inverse of :func:`pack`."""
    b, n, hh, wh, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, n, hh, wh, 2, 2, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, n, 2 * hh, 2 * wh, c)


def pack_affine(scale: jax.Array, shift: jax.Array):
    """Per-channel affine -> packed channels (same values in each phase)."""
    return jnp.tile(scale, 4), jnp.tile(shift, 4)


def _in_index(in_groups):
    """Packed input channel index for original channel ``ci`` at phase ``p``.

    ``in_groups=[c0, c1, ...]``: the packed input is a channel-concat of
    independently packed tensors of those widths (packed concat != packed of
    concat, so the weight scatter absorbs the permutation).
    """

    def idx(p, ci):
        off = 0
        for g in in_groups:
            if ci < g:
                return off + p * g + ci
            ci -= g
            off += 4 * g
        raise IndexError(ci)

    return idx


# The transforms below run on jit-traced weights, so they must be ONE gather
# each (a scatter-loop formulation emits hundreds of dynamic-update-slice ops
# into every compiled forward).  Each builds a cached numpy index map
# (dy, dx, ci, co) -> source tap (or masked zero) once per shape, then
# gathers ``w[:, dy_map, dx_map, ci_map, co_map] * mask``.

import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=None)
def _s1_index_map(ci: int, co: int, groups: tuple):
    idx = _in_index(list(groups))
    shape = (3, 3, 4 * ci, 4 * co)
    dym = _np.zeros(shape, _np.int32)
    dxm = _np.zeros(shape, _np.int32)
    cim = _np.zeros(shape, _np.int32)
    com = _np.zeros(shape, _np.int32)
    mask = _np.zeros(shape, _np.float32)
    cos = _np.arange(co)
    for qy in (0, 1):
        for qx in (0, 1):
            q = qy * 2 + qx
            for dy in range(3):
                for dx in range(3):
                    py, dy_c = (qy + dy - 1) % 2, (qy + dy - 1) // 2
                    px, dx_c = (qx + dx - 1) % 2, (qx + dx - 1) // 2
                    p_in = py * 2 + px
                    for c0 in range(ci):
                        j = idx(p_in, c0)
                        sl = (dy_c + 1, dx_c + 1, j, slice(q * co, (q + 1) * co))
                        dym[sl], dxm[sl], cim[sl], com[sl] = dy, dx, c0, cos
                        mask[sl] = 1.0
    return dym, dxm, cim, com, mask


def pack_conv_s1(w: jax.Array, in_groups=None) -> jax.Array:
    """Stride-1 ``(kd,3,3)`` conv (pad 1) -> packed ``(kd,3,3, 4Ci, 4Co)``.

    out[2Y+qy] = sum_dy w[dy] x[2Y+qy+dy-1]; the input lands at packed cell
    Y + DY, phase py with DY = floor((qy+dy-1)/2), py = (qy+dy-1) mod 2, so
    kernel tap (DY+1) carries w[dy] for that (phase_in, phase_out) block.
    Apply with padding (pd, 1, 1) on the packed lattice.
    """
    kd, kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    groups = tuple(in_groups or [ci])
    assert sum(groups) == ci
    dym, dxm, cim, com, mask = _s1_index_map(ci, co, groups)
    return w[:, dym, dxm, cim, com] * jnp.asarray(mask, w.dtype)


@_functools.lru_cache(maxsize=None)
def _s2_index_map(ci: int, co: int):
    shape = (2, 2, 4 * ci, co)
    dym = _np.zeros(shape, _np.int32)
    dxm = _np.zeros(shape, _np.int32)
    cim = _np.zeros(shape, _np.int32)
    com = _np.zeros(shape, _np.int32)
    mask = _np.zeros(shape, _np.float32)
    cis, cos = _np.arange(ci)[:, None], _np.arange(co)[None, :]
    for dy in range(3):
        for dx in range(3):
            py, dy_c = (dy - 1) % 2, (dy - 1) // 2
            px, dx_c = (dx - 1) % 2, (dx - 1) // 2
            p_in = py * 2 + px
            sl = (dy_c + 1, dx_c + 1, slice(p_in * ci, (p_in + 1) * ci), slice(None))
            dym[sl], dxm[sl], cim[sl], com[sl] = dy, dx, cis, cos
            mask[sl] = 1.0
    return dym, dxm, cim, com, mask


def pack_conv_s2(w: jax.Array) -> jax.Array:
    """Strided ``(kd,3,3) s(1,2,2)`` conv (pad 1) -> packed ``(kd,2,2,4Ci,Co)``
    producing the half-res (unpacked) output directly.

    out[Y] = sum_dy w[dy] x[2Y+dy-1]: cells {Y-1, Y} -> kernel 2, pad-left 1
    on the packed lattice (apply with padding ((pd,pd),(1,0),(1,0))).
    """
    kd, kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    dym, dxm, cim, com, mask = _s2_index_map(ci, co)
    return w[:, dym, dxm, cim, com] * jnp.asarray(mask, w.dtype)


@_functools.lru_cache(maxsize=None)
def _deconv_index_map(ci: int, co: int):
    taps = {(0, 0): 1, (1, 0): 2, (1, 1): 0}  # (phase, window tap) -> w index
    shape = (2, 2, ci, 4 * co)
    dym = _np.zeros(shape, _np.int32)
    dxm = _np.zeros(shape, _np.int32)
    cim = _np.zeros(shape, _np.int32)
    com = _np.zeros(shape, _np.int32)
    mask = _np.zeros(shape, _np.float32)
    cis, cos = _np.arange(ci)[:, None], _np.arange(co)[None, :]
    for qy in (0, 1):
        for qx in (0, 1):
            q = qy * 2 + qx
            for ty in (0, 1):
                for tx in (0, 1):
                    iy = taps.get((qy, ty))
                    ix = taps.get((qx, tx))
                    if iy is None or ix is None:
                        continue
                    sl = (ty, tx, slice(None), slice(q * co, (q + 1) * co))
                    dym[sl], dxm[sl], cim[sl], com[sl] = iy, ix, cis, cos
                    mask[sl] = 1.0
    return dym, dxm, cim, com, mask


def pack_deconv(w: jax.Array) -> jax.Array:
    """``ConvTranspose3d(k3, s(1,2,2), p1, op(0,1,1))`` -> packed
    ``(kd,2,2, Ci, 4Co)`` consuming the half-res input, emitting packed
    full-res.

    Per spatial dim: out[2Y] = w[1] x[Y]; out[2Y+1] = w[2] x[Y] + w[0] x[Y+1]
    -> cells {Y, Y+1}, kernel 2, pad-right 1 (apply with padding
    ((1,1),(0,1),(0,1)) since the focus axis is the usual flipped-kernel
    stride-1 transposed conv).
    """
    kd, kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    wf = jnp.flip(w, axis=0)  # focus-axis correlation flip
    dym, dxm, cim, com, mask = _deconv_index_map(ci, co)
    return wf[:, dym, dxm, cim, com] * jnp.asarray(mask, w.dtype)


@_functools.lru_cache(maxsize=None)
def _conv1x1_index_map(ci: int, co: int):
    shape = (4 * ci, 4 * co)
    cim = _np.zeros(shape, _np.int32)
    com = _np.zeros(shape, _np.int32)
    mask = _np.zeros(shape, _np.float32)
    cis, cos = _np.arange(ci)[:, None], _np.arange(co)[None, :]
    for p in range(4):
        sl = (slice(p * ci, (p + 1) * ci), slice(p * co, (p + 1) * co))
        cim[sl], com[sl] = cis, cos
        mask[sl] = 1.0
    return cim, com, mask


def pack_conv_1x1(w: jax.Array) -> jax.Array:
    """1x1x1 conv -> packed block-diagonal ``(1,1,1, 4Ci, 4Co)``."""
    kd, kh, kw, ci, co = w.shape
    assert (kd, kh, kw) == (1, 1, 1)
    cim, com, mask = _conv1x1_index_map(ci, co)
    return (w[:, 0, 0, cim, com] * jnp.asarray(mask, w.dtype))[:, None, None]


def _conv(x, w, pad, precision=None):
    return lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), *pad, (0, 0))), w, (1, 1, 1), "VALID",
        dimension_numbers=_DIMS, precision=precision,
    )


def _bn_packed(p, pfx, x, dtype):
    scale, shift = bn_fused_affine(
        p[f"{pfx}.weight"], p[f"{pfx}.bias"],
        p[f"{pfx}.running_mean"], p[f"{pfx}.running_var"],
    )
    s, b = pack_affine(scale, shift)
    return x * s.astype(dtype) + b.astype(dtype)


def packed_efd_apply(p, pfx, xp, ctx):
    """EFD (`Depth_Estimation_Network.py:306-315`) consuming a PACKED input.

    * strided-conv branch: the packed stride-2 kernel emits the half-res
      (natural) output directly;
    * maxpool branch: ``MaxPool3d(1,2,2)`` windows are exactly the aligned
      2x2 phase blocks, so the pool is a max over the 4 phase channel groups.
    """
    from dffx.models.layers import apply_bn, apply_convbn, relu

    dt = xp.dtype
    w = p[f"{pfx}.stride_conv.0.weight"].astype(dt)
    a = _conv(xp, pack_conv_s2(w), [(1, 1), (1, 0), (1, 0)], ctx.precision)
    a = apply_bn(p, f"{pfx}.stride_conv.1", a, ctx)
    b, n, hh, wh, c4 = xp.shape
    mp = jnp.max(xp.reshape(b, n, hh, wh, 4, c4 // 4), axis=4)
    bb = apply_convbn(p, f"{pfx}.max_pooling.1", mp, ctx, padding=1)
    return relu(a + bb)


def packed_stage_apply(p, q, names, out_in, skip, presqu, postsqu, ctx,
                       *, return_state=False):
    """One decoder stage — ``deconv_k`` + ``hourglass dres_{k+1}`` +
    ``classif_k`` — evaluated on the packed lattice of the stage's (2x-up)
    resolution.  The three stages of the reference decoder
    (`Depth_Estimation_Network.py:92-108`) share this exact structure.

    ``names = (deconv, hourglass, classif)`` parameter prefixes (un-q'd).
    Packed pieces: the up-deconv, the hourglass's conv0 (stage res) / conv1
    (strided back down, emitting the natural interior resolution) / conv6
    (deconv back up), the residual add, and the 1x1 classif head.  The
    hourglass interior (conv2..conv5) already runs at half the stage
    resolution and below and stays on the ordinary path; the cross-hourglass
    skip state (presqu/postsqu, `Depth_Estimation_Network.py:269-280`) is
    exchanged in natural layout.

    Returns ``cost`` (natural, stage res), plus ``(out_in, pre_1, hg_out)``
    in natural layout for the next stage when ``return_state``.
    """
    from dffx.models.layers import apply_bn, apply_convbn, apply_deconvbn, relu

    deconv, hg, classif = names
    c = skip.shape[-1]
    dt = out_in.dtype
    prec = ctx.precision

    def w_(name):
        return p[q(name)].astype(dt)

    # deconv_k + BN -> packed 4C at the stage's half lattice
    x = _conv(out_in, pack_deconv(w_(f"{deconv}.0.weight")),
              [(1, 1), (0, 1), (0, 1)], prec)
    x = _bn_packed(p, q(f"{deconv}.1"), x, dt)

    cat = jnp.concatenate([x, pack(skip)], axis=-1)  # source-major packed 2C

    h0 = _conv(cat, pack_conv_s1(w_(f"{hg}.conv0.0.0.weight"), in_groups=[c, c]),
               [(1, 1), (1, 1), (1, 1)], prec)
    pre_1 = relu(_bn_packed(p, q(f"{hg}.conv0.0.1"), h0, dt))

    out = _conv(pre_1, pack_conv_s2(w_(f"{hg}.conv1.0.0.weight")),
                [(1, 1), (1, 0), (1, 0)], prec)
    out = relu(apply_bn(p, q(f"{hg}.conv1.0.1"), out, ctx))
    pre = apply_convbn(p, q(f"{hg}.conv2"), out, ctx, padding=1)
    pre = relu(pre + postsqu) if postsqu is not None else relu(pre)
    out = relu(apply_convbn(p, q(f"{hg}.conv3.0"), pre, ctx, stride=(1, 2, 2), padding=1))
    out = relu(apply_convbn(p, q(f"{hg}.conv4.0"), out, ctx, padding=1))
    up = apply_deconvbn(p, q(f"{hg}.conv5"), out, ctx)
    out = relu(up + (presqu if presqu is not None else pre))

    o6 = _conv(out, pack_deconv(w_(f"{hg}.conv6.0.weight")),
               [(1, 1), (0, 1), (0, 1)], prec)
    o6 = _bn_packed(p, q(f"{hg}.conv6.1"), o6, dt)

    final = x + o6  # out2 + hourglass output, packed
    # classif heads are bias-free (`Depth_Estimation_Network.py:51-55`)
    cost = _conv(final, pack_conv_1x1(w_(f"{classif}.weight")),
                 [(0, 0), (0, 0), (0, 0)], prec)
    cost = unpack(cost)[..., 0]
    if return_state:
        return cost, unpack(final), unpack(pre_1), unpack(o6)
    return cost
