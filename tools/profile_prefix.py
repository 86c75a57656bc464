"""Marginal per-stage cost via cumulative-prefix timing of the real forward.

Times jitted prefixes of ``dffnet_apply`` (stage 1, stages 1-2, ...) with the
true dataflow, so each difference is the marginal cost of one stage inside the
whole-program schedule — more honest than isolated stage timing, which loses
XLA's cross-stage fusion/overlap.

    python tools/profile_prefix.py [--batch 1] [--hw 384 384] [--pallas]
"""

from __future__ import annotations

import argparse

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


def stages(p, fs, fd, ctx, upto: int):
    """First ``upto`` stages of dffnet_apply; returns all live tensors."""
    q = lambda s: f"DFF_net.{s}"  # noqa: E731
    _, _, h, w, _ = fs.shape
    outs = []
    fm = fm_module_apply(p, q("FM_measure"), fs, ctx)
    if upto == 1:
        return fm
    half = srd_apply(p, q("FM_conv1.1"), efd_apply(p, q("FM_conv1.0"), fm, ctx), ctx)
    if upto == 2:
        return half
    quad = srd_apply(p, q("FM_conv2.1"), efd_apply(p, q("FM_conv2.0"), half, ctx), ctx)
    if upto == 3:
        return quad
    vol = dffnet.hourglassup_apply(p, q("SPP_module"), quad, ctx)
    if upto == 4:
        return vol
    conf = relu(apply_convbn(p, q("confidence.0"), vol, ctx, padding=1))
    conf = apply_conv(p, q("confidence.2"), conf, ctx, padding=1)[..., 0]
    mid_out = softplus_argmax(upsample_bilinear(conf, (h, w)), fd)
    if upto == 5:
        return mid_out
    x = relu(apply_convbn(p, q("dres0.0"), vol, ctx, padding=1))
    x = relu(apply_convbn(p, q("dres0.2"), x, ctx, padding=1))
    x = apply_deconvbn(p, q("deconv_1"), x, ctx)
    if upto == 6:
        return (mid_out, x)
    out, pre = dffnet.hourglass_apply(p, q("dres2"), jnp.concatenate([x, quad], -1), None, None, ctx)
    out_in = x + out
    cost1 = apply_conv(p, q("classif1.0"), out_in, ctx)[..., 0]
    if upto == 7:
        return (mid_out, cost1, out_in, pre, out)
    pred1 = softplus_argmax(upsample_bilinear(cost1, (h, w)), fd)
    if upto == 8:
        return (mid_out, pred1, out_in, pre, out)
    out2 = apply_deconvbn(p, q("deconv_2"), out_in, ctx)
    out, pre = dffnet.hourglass_apply(p, q("dres3"), jnp.concatenate([out2, half], -1), pre, out, ctx)
    out_in = out2 + out
    cost2 = apply_conv(p, q("classif2.0"), out_in, ctx)[..., 0]
    if upto == 9:
        return (mid_out, pred1, cost2, out_in, pre, out)
    pred2 = softplus_argmax(upsample_bilinear(cost2, (h, w)), fd)
    if upto == 10:
        return (mid_out, pred1, pred2, out_in, pre, out)
    out2 = apply_deconvbn(p, q("deconv_3"), out_in, ctx)
    hout, _ = dffnet.hourglass_apply(p, q("dres4"), jnp.concatenate([out2, fm], -1), pre, out, ctx)
    cost3 = apply_conv(p, q("classif3.0"), out2 + hout, ctx)[..., 0]
    if upto == 11:
        return (mid_out, pred1, pred2, cost3)
    pred3 = softplus_argmax(cost3, fd)
    return (mid_out, pred1, pred2, pred3)


NAMES = [
    "fm_module", "efd1+srd1", "efd2+srd2", "hourglassup", "conf+D1",
    "dres0+deconv_1", "dres2+classif1", "D2 head", "deconv_2+dres3+classif2",
    "D3 head", "deconv_3+dres4+classif3", "D4 head",
]


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
    fs = jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)), dt)
    fd = jnp.asarray(np.tile(np.linspace(0.2, 7.0, n, dtype=np.float32), (b, 1)))

    prev = 0.0
    for upto in range(1, 13):
        def fn(x, p, d, upto=upto):
            return stages(p, x.astype(dt), d, ctx, upto)
        per = device_loop_time(fn, fs, params, fd, iters=args.iters)
        print(f"after {NAMES[upto-1]:28s} cum {per*1e3:8.3f} ms   marginal {(per-prev)*1e3:8.3f} ms")
        prev = per


if __name__ == "__main__":
    main()
