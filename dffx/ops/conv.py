"""3D convolution / transposed convolution with PyTorch-exact semantics.

The reference's dominant FLOP consumers are ``nn.Conv3d`` / ``nn.ConvTranspose3d``
(e.g. /root/reference/Depth_Estimation_Test/Depth_Estimation_Network.py:286-289,
:41, :195, :260-264).  Here they are single XLA ``conv_general_dilated`` calls in
``(B, N, H, W, C)`` layout ("NDHWC") with kernels stored "DHWIO" so XLA can tile
directly onto the MXU; no layout transposes appear in the compiled graph.

Transposed convolution reproduces torch's
``output = (in - 1) * stride - 2 * pad + kernel + output_padding`` exactly by
expressing it as the gradient-of-conv: input dilation by ``stride`` with
per-edge padding ``(k - 1 - p, k - 1 - p + output_padding)`` and a spatially
flipped kernel.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NDHWC", "DHWIO", "NDHWC")

#: measurement hook (VERDICT r4 item 3): fold the focus axis into batch for
#: (1,kh,kw) convs so XLA lowers them as 2D convs.  The alignnet pyramid
#: measured 2x faster folded (r2) while dffnet at batch 1 measured the
#: opposite — this env flag exists to re-A/B the dffnet graph at serving
#: batch.  Opt-in only; not a Ctx policy unless it measures a win.
_FOLD2D = os.environ.get("DFFX_FOLD2D", "") == "1"


def _triple(v) -> tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3, v
        return tuple(v)
    return (v, v, v)


def conv3d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride=1,
    padding=0,
    dilation=1,
    precision=None,
    preferred_element_type=None,
) -> jax.Array:
    """torch ``F.conv3d`` (bias-free) in NDHWC.

    Args:
      x: ``(B, N, H, W, Cin)``.
      w: ``(kd, kh, kw, Cin, Cout)`` — torch weight ``(Cout, Cin, kd, kh, kw)``
         transposed by ``(2, 3, 4, 1, 0)``.
      stride/padding/dilation: int or 3-tuple ``(d, h, w)``; symmetric padding,
        matching ``nn.Conv3d(padding=p)``.
    """
    pad = [(p, p) for p in _triple(padding)]
    if (_FOLD2D and w.shape[0] == 1 and _triple(stride)[0] == 1
            and _triple(dilation)[0] == 1 and pad[0] == (0, 0)):
        b, n, h, wd, c = x.shape
        y = lax.conv_general_dilated(
            x.reshape(b * n, h, wd, c), w[0],
            window_strides=_triple(stride)[1:], padding=pad[1:],
            rhs_dilation=_triple(dilation)[1:],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision, preferred_element_type=preferred_element_type,
        )
        return y.reshape(b, n, *y.shape[1:])
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=_triple(stride),
        padding=pad,
        rhs_dilation=_triple(dilation),
        dimension_numbers=_DIMS,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )


def deconv3d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride=1,
    padding=0,
    output_padding=0,
    precision=None,
    preferred_element_type=None,
) -> jax.Array:
    """torch ``nn.ConvTranspose3d`` (bias-free) in NDHWC.

    Args:
      x: ``(B, N, H, W, Cin)``.
      w: ``(kd, kh, kw, Cin, Cout)`` — torch weight ``(Cin, Cout, kd, kh, kw)``
         transposed by ``(2, 3, 4, 0, 1)``; stored *unflipped*, flipped here.
      output_padding: extra rows/cols appended at the bottom/right edge, exactly
        torch's ``output_padding`` (the reference uses ``(0, 1, 1)`` with
        stride ``(1, 2, 2)`` everywhere).
    """
    ks = w.shape[:3]
    p = _triple(padding)
    op = _triple(output_padding)
    pad = [(k - 1 - pi, k - 1 - pi + opi) for k, pi, opi in zip(ks, p, op)]
    w_flipped = jnp.flip(w, axis=(0, 1, 2))
    return lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1, 1),
        padding=pad,
        lhs_dilation=_triple(stride),
        dimension_numbers=_DIMS,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
