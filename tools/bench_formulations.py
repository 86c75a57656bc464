"""Micro-benchmarks of alternative XLA formulations for the hot conv shapes.

Answers, on the real chip: is XLA's NDHWC 3D conv / lhs_dilation deconv
lowering the bottleneck, and do 2D-folded (B*N batch) or sub-pixel (conv +
depth-to-space) reformulations win?  Drives the apply_conv/apply_deconv
rewiring decisions.

    python tools/bench_formulations.py [--batch 1]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dffx.ops import conv3d, deconv3d
from dffx.utils.profiling import device_loop_time, enable_persistent_cache


def time_fn(name, fn, *args, iters=20):
    per = device_loop_time(jax.jit(fn), *args, iters=iters)
    print(f"  {name:44s} {per * 1e3:8.3f} ms")
    return per


def conv2d_nhwc(x, w, *, stride=1, padding="SAME", dilation=1):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride) if isinstance(stride, int) else stride,
        padding=padding,
        rhs_dilation=(dilation, dilation) if isinstance(dilation, int) else dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    enable_persistent_cache()
    b, n = args.batch, 10
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    # ---- A. (3,3,3) conv 16->8 @ full res (dres4.conv0 shape) ----
    print(f"A. conv (3,3,3) 16->8 @ {b}x{n}x384x384")
    x = mk((b, n, 384, 384, 16))
    w = mk((3, 3, 3, 16, 8))

    time_fn("3D NDHWC (current)",
            lambda x, w: conv3d(x, w, padding=1), x, w)

    def folded_shift(x, w):
        # fold N into batch; sum three 2D convs over the N-shifts
        bb, nn, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = 0
        for dn in range(3):
            xs = xp[:, dn : dn + nn].reshape(bb * nn, h, wd, c)
            out = out + conv2d_nhwc(xs, w[dn])
        return out.reshape(bb, nn, h, wd, -1)

    time_fn("2D folded + N-shift sum", folded_shift, x, w)

    def folded_bigc(x, w):
        # treat (N+2 padded) slices as one 2D conv with Cin = 3*C via
        # channel-concat of the three shifts
        bb, nn, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xs = jnp.concatenate([xp[:, dn : dn + nn] for dn in range(3)], axis=-1)
        xs = xs.reshape(bb * nn, h, wd, 3 * c)
        wk = jnp.concatenate([w[0], w[1], w[2]], axis=2)  # (3,3,3C,Co)
        return conv2d_nhwc(xs, wk).reshape(bb, nn, h, wd, -1)

    time_fn("2D folded, shifts as channels (K=3C)", folded_bigc, x, w)

    # ---- B. deconv (3,3,3) s(1,2,2) 16->8 half->full (deconv_3 shape) ----
    print(f"B. deconv 16->8 s(1,2,2) @ {b}x{n}x192x192 -> 384")
    xh = mk((b, n, 192, 192, 16))
    wd_ = mk((3, 3, 3, 16, 8))

    time_fn("lhs_dilation (current)",
            lambda x, w: deconv3d(x, w, stride=(1, 2, 2), padding=1,
                                  output_padding=(0, 1, 1)), xh, wd_)

    def subpixel(x, w):
        # ConvTranspose(k3, s2, p1, op1) == conv(k2-per-phase) + d2s.
        # output y=2Y+q reads input cells {Y, Y+1} for q=0... derive via
        # zero-padded k=2 taps; here benchmark-only approximation of cost:
        # one conv (3,2,2) 16 -> 32 at half res, then depth-to-space.
        bb, nn, h, wdim, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 0), (1, 0), (0, 0)))
        wk = mk((3, 2, 2, 16, 32))
        out = jax.lax.conv_general_dilated(
            xp.reshape(bb, nn + 2, h + 1, wdim + 1, c),
            wk, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )  # (b, n, h, w, 32)
        out = out.reshape(bb, nn, h, wdim, 2, 2, 8)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(bb, nn, 2 * h, 2 * wdim, 8)
        return out

    time_fn("sub-pixel conv + d2s (cost model)", subpixel, xh, wd_)

    def subpixel2d(x, w):
        bb, nn, h, wdim, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        wk = mk((2, 2, 3 * c, 32))
        xs = jnp.concatenate([xp[:, dn : dn + nn] for dn in range(3)], axis=-1)
        xs = jnp.pad(xs.reshape(bb * nn, h, wdim, 3 * c), ((0, 0), (1, 0), (1, 0), (0, 0)))
        out = conv2d_nhwc(xs, wk, padding="VALID")
        out = out.reshape(bb, nn, h, wdim, 2, 2, 8)
        return out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(bb, nn, 2 * h, 2 * wdim, 8)

    time_fn("2D sub-pixel (K=3C) + d2s (cost model)", subpixel2d, xh, wd_)

    # ---- C. (1,3,3) conv 8->8 @ full res (SRD rb2d shape) ----
    print(f"C. conv (1,3,3) 8->8 @ {b}x{n}x384x384")
    x8 = mk((b, n, 384, 384, 8))
    w8 = mk((1, 3, 3, 8, 8))
    time_fn("3D NDHWC (current)",
            lambda x, w: conv3d(x, w, padding=(0, 1, 1)), x8, w8)
    time_fn("2D folded",
            lambda x, w: conv2d_nhwc(
                x.reshape(-1, 384, 384, 8), w[0]).reshape(x.shape[:4] + (-1,)),
            x8, w8)

    # ---- D. dilated (1,9,9) 3->8 @ full res (FM shape) ----
    print(f"D. dilated (1,9,9)x(1,2,2) 3->8 @ {b}x{n}x384x384")
    x3 = mk((b, n, 384, 384, 3))
    w9 = mk((1, 9, 9, 3, 8))
    time_fn("3D NDHWC (current)",
            lambda x, w: conv3d(x, w, padding=(0, 8, 8), dilation=(1, 2, 2)), x3, w9)
    time_fn("2D folded",
            lambda x, w: conv2d_nhwc(
                x.reshape(-1, 384, 384, 3), w[0], padding=[(8, 8), (8, 8)],
                dilation=2).reshape(x.shape[:4] + (-1,)),
            x3, w9)

    # ---- E. strided conv (3,3,3) s(1,2,2) 8->16 (EFD shape) ----
    print(f"E. conv (3,3,3) s(1,2,2) 8->16 @ {b}x{n}x384x384")
    xe = mk((b, n, 384, 384, 8))
    we = mk((3, 3, 3, 8, 16))
    time_fn("3D NDHWC (current)",
            lambda x, w: conv3d(x, w, stride=(1, 2, 2), padding=1), xe, we)

    def folded_strided(x, w):
        bb, nn, h, wdim, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xs = jnp.concatenate([xp[:, dn : dn + nn] for dn in range(3)], axis=-1)
        xs = xs.reshape(bb * nn, h, wdim, 3 * c)
        wk = jnp.concatenate([w[0], w[1], w[2]], axis=2)
        out = conv2d_nhwc(xs, wk, stride=2)
        return out.reshape(bb, nn, h // 2, wdim // 2, -1)

    time_fn("2D folded (K=3C) strided", folded_strided, xe, we)


if __name__ == "__main__":
    main()
