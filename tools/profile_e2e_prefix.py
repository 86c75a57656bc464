"""Marginal per-stage cost of the E2E (alignment + depth) forward.

Cumulative-prefix timing of ``flownet_apply`` → ``dffnet_apply`` with the real
dataflow (same methodology as ``profile_prefix.py``): each difference is the
marginal in-context cost of one stage inside the whole jitted program.

    python tools/profile_e2e_prefix.py [--hw 608 1088] [--pallas]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from dffx.models import Ctx, e2e_network_specs, init_params
from dffx.models import alignnet
from dffx.models.alignnet import (
    _head_apply,
    _motion_volume,
    _rb_of_apply,
    _rb_of_stack_apply,
)
from dffx.models.dffnet import dffnet_apply
from dffx.ops import affine_warp_stack
from dffx.utils.profiling import device_loop_time, enable_persistent_cache

PFX = "optical_flow_aggregation"


def stages(p, fs, fovs, fd, ctx, upto: int):
    q = lambda n: f"{PFX}.{n}"  # noqa: E731
    b, n = fs.shape[0], fs.shape[1]

    # pyramid levels route EXACTLY as flownet_apply._pyr does (ADVICE r4:
    # under --pallas the stride-1 pairs/tails must hit the fused rb_of_chain
    # or the profile misattributes stage costs): fused pair at stride 1,
    # stride block + single-block chain otherwise
    fe1 = _rb_of_stack_apply(p, [q("OF_feature.0"), q("OF_feature.1")], fs, ctx)
    if upto == 1:
        return fe1
    fe2 = _rb_of_stack_apply(
        p, [q("OF_feature1.1")],
        _rb_of_apply(p, q("OF_feature1.0"), fe1, ctx, stride=2), ctx)
    if upto == 2:
        return fe2
    fe3 = _rb_of_stack_apply(
        p, [q("OF_feature2.1")],
        _rb_of_apply(p, q("OF_feature2.0"), fe2, ctx, stride=2), ctx)
    if upto == 3:
        return fe3

    zeros = jnp.zeros((b, n), dtype=jnp.float32)

    def warp_head(head, feat, alpha, beta, gamma):
        feat_w, flow = affine_warp_stack(feat, alpha, beta, gamma)
        d = _head_apply(p, q(head), _motion_volume(feat_w, flow), ctx)
        return d.at[:, :, 0].multiply(alignnet.ALPHA_DAMPING)

    motion = warp_head("conv1", fe3, fovs, zeros, zeros)
    if upto == 4:
        return (fe1, fe2, motion)
    motion = motion + warp_head("conv2", fe2, motion[:, :, 0] + fovs,
                                motion[:, :, 1], motion[:, :, 2])
    if upto == 5:
        return (fe1, motion)
    motion = motion + warp_head("conv3", fe1, motion[:, :, 0] + fovs,
                                motion[:, :, 1], motion[:, :, 2])
    if upto == 6:
        return motion
    warped, _ = affine_warp_stack(fs, motion[:, :, 0] + fovs,
                                  motion[:, :, 1], motion[:, :, 2])
    if upto == 7:
        return warped
    return dffnet_apply(p, warped, fd, ctx)


NAMES = [
    "pyramid fe1 (full-res)", "pyramid fe2 (1/2)", "pyramid fe3 (1/4)",
    "warp+head conv1 (1/4, 66ch)", "warp+head conv2 (1/2, 34ch)",
    "warp+head conv3 (full, 18ch)", "final warp of fs", "dffnet (depth)",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[608, 1088])
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    enable_persistent_cache()
    n = args.n
    h, w = args.hw
    dt = jnp.dtype(args.dtype)
    ctx = Ctx(compute_dtype=dt, use_pallas=args.pallas, use_packed=args.pallas)
    params = init_params(e2e_network_specs(), seed=0)
    rng = np.random.default_rng(0)
    fs = jnp.asarray(rng.uniform(-1, 1, (1, n, h, w, 3)), dt)
    fovs = jnp.asarray(np.linspace(1.0, 1.02, n, dtype=np.float32)[None])
    fd = jnp.asarray(np.linspace(0.2, 7.0, n, dtype=np.float32)[None])

    prev = 0.0
    for upto in range(1, 9):
        def fn(x, p, upto=upto):
            return stages(p, x.astype(dt), fovs, fd, ctx, upto)
        per = device_loop_time(fn, fs, params, iters=args.iters)
        print(f"after {NAMES[upto-1]:30s} cum {per*1e3:8.3f} ms   "
              f"marginal {(per-prev)*1e3:8.3f} ms", flush=True)
        prev = per


if __name__ == "__main__":
    main()
