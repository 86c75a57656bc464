"""Per-stage device timing of the DFFNet forward on the current backend.

Times each pipeline stage (SURVEY.md §2.1 resolution flow) in isolation with
``device_loop_time`` so perf work targets the real hot spots instead of FLOP
counts.  Run on the TPU:

    python tools/profile_stages.py [--batch 1] [--hw 384 384] [--pallas]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dffx.models import Ctx, init_params, network_specs
from dffx.models import dffnet
from dffx.models.layers import (
    apply_conv,
    apply_convbn,
    apply_deconvbn,
    efd_apply,
    fm_module_apply,
    relu,
    srd_apply,
)
from dffx.ops import softplus_argmax, upsample_bilinear
from dffx.utils.profiling import device_loop_time, enable_persistent_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hw", type=int, nargs=2, default=[384, 384])
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    enable_persistent_cache()
    b, n = args.batch, args.n
    h, w = args.hw
    dt = jnp.dtype(args.dtype)
    ctx = Ctx(compute_dtype=dt, use_pallas=args.pallas)
    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    q = lambda s: f"DFF_net.{s}"  # noqa: E731

    def t(name, fn, *xs):
        per = device_loop_time(fn, *xs, iters=args.iters)
        print(f"{name:34s} {per * 1e3:8.3f} ms")
        return per

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    fs = mk((b, n, h, w, 3))
    fd = jnp.asarray(np.tile(np.linspace(0.2, 7.0, n, dtype=np.float32), (b, 1)))

    total = 0.0
    total += t("fm_module (1/1, 3->8)", lambda x: fm_module_apply(params, q("FM_measure"), x, ctx), fs)
    fm = mk((b, n, h, w, 8))
    total += t("efd1+srd1 (->1/2, 16)",
               lambda x: srd_apply(params, q("FM_conv1.1"),
                                   efd_apply(params, q("FM_conv1.0"), x, ctx), ctx), fm)
    half = mk((b, n, h // 2, w // 2, 16))
    total += t("efd2+srd2 (->1/4, 32)",
               lambda x: srd_apply(params, q("FM_conv2.1"),
                                   efd_apply(params, q("FM_conv2.0"), x, ctx), ctx), half)
    quad = mk((b, n, h // 4, w // 4, 32))
    total += t("hourglassup (->1/8, 32)",
               lambda x: dffnet.hourglassup_apply(params, q("SPP_module"), x, ctx), quad)
    vol = mk((b, n, h // 8, w // 8, 32))

    def conf_head(x, d):
        c = relu(apply_convbn(params, q("confidence.0"), x, ctx, padding=1))
        c = apply_conv(params, q("confidence.2"), c, ctx, padding=1)[..., 0]
        return softplus_argmax(upsample_bilinear(c, (h, w)), d)

    total += t("confidence + D1 head", conf_head, vol, fd)

    def dres0_fn(x):
        y = relu(apply_convbn(params, q("dres0.0"), x, ctx, padding=1))
        y = relu(apply_convbn(params, q("dres0.2"), y, ctx, padding=1))
        return apply_deconvbn(params, q("deconv_1"), y, ctx)

    total += t("dres0 + deconv_1 (->1/4, 32)", dres0_fn, vol)

    x4 = mk((b, n, h // 4, w // 4, 32))

    def hg2_fn(x, skip):
        out, pre = dffnet.hourglass_apply(params, q("dres2"),
                                          jnp.concatenate([x, skip], -1), None, None, ctx)
        return apply_conv(params, q("classif1.0"), x + out, ctx)[..., 0]

    total += t("hourglass dres2 (1/4, 64ch in)", hg2_fn, x4, quad)
    total += t("D2 head (up 1/4->1/1 + argmax)",
               lambda c, d: softplus_argmax(upsample_bilinear(c, (h, w)), d),
               mk((b, n, h // 4, w // 4)), fd)

    def hg3_fn(x, skip):
        x2 = apply_deconvbn(params, q("deconv_2"), x, ctx)
        out, pre = dffnet.hourglass_apply(params, q("dres3"),
                                          jnp.concatenate([x2, skip], -1),
                                          mk((b, n, h // 4, w // 4, 32)),
                                          mk((b, n, h // 4, w // 4, 32)), ctx)
        return apply_conv(params, q("classif2.0"), x2 + out, ctx)[..., 0]

    total += t("deconv_2 + dres3 (1/2, 32ch in)", hg3_fn, x4, half)
    total += t("D3 head (up 1/2->1/1 + argmax)",
               lambda c, d: softplus_argmax(upsample_bilinear(c, (h, w)), d),
               mk((b, n, h // 2, w // 2)), fd)

    x2in = mk((b, n, h // 2, w // 2, 16))

    def hg4_fn(x, skip):
        x1 = apply_deconvbn(params, q("deconv_3"), x, ctx)
        out, _ = dffnet.hourglass_apply(params, q("dres4"),
                                        jnp.concatenate([x1, skip], -1),
                                        mk((b, n, h // 2, w // 2, 16)),
                                        mk((b, n, h // 2, w // 2, 16)), ctx)
        return apply_conv(params, q("classif3.0"), x1 + out, ctx)[..., 0]

    total += t("deconv_3 + dres4 (1/1, 16ch in)", hg4_fn, x2in, fm)
    total += t("D4 head (argmax only)",
               lambda c, d: softplus_argmax(c, d), mk((b, n, h, w)), fd)

    print(f"{'SUM of stages':34s} {total * 1e3:8.3f} ms")

    def full(x, p, d):
        return dffnet.dffnet_apply(p, x, d, ctx)

    t("FULL forward", full, fs, params, fd)


if __name__ == "__main__":
    main()
