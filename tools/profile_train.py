"""In-context decomposition of the jitted train step (VERDICT r2 item 1).

Two views, both measured with on-device chained loops (the house rule:
whole-graph timing only — isolated op benchmarks reversed direction four
times in round 2):

* ``--mode components`` — the step pipeline cut at natural seams:
  eval-mode forward, train-mode forward (BN batch stats), value_and_grad
  (fwd+bwd), grads + Adam + BN-stat writeback (the full step body).
  Differences localize cost to forward / backward / optimizer.

* ``--mode prefix`` — cumulative-prefix fwd+bwd marginals: grad of a
  sum-of-squares loss over stage prefixes of the real forward (train-mode
  BN), so each difference is one stage's forward+backward cost inside the
  whole-program schedule.

    python tools/profile_train.py [--batch 32] [--hw 224 224] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from dffx.models import Ctx, init_params, network_specs, trainable_mask
from dffx.train import LossConfig, create_train_state, make_train_step
from dffx.train.loop import total_loss
from dffx.models import dffnet_apply
from dffx.utils.profiling import device_loop_time, enable_persistent_cache

import profile_prefix  # stage prefixes of the real forward (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=[224, 224])
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--mode", choices=["components", "prefix"], default="components")
    ap.add_argument("--remat", nargs="?", const="on", default="off",
                    choices=["on"])
    args = ap.parse_args()

    enable_persistent_cache()
    b, n = args.batch, args.n
    h, w = args.hw
    dt = jnp.dtype(args.dtype)
    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    fs = jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)), dt)
    fd = jnp.asarray(np.tile(np.linspace(0, 1, n, dtype=np.float32), (b, 1)))
    depth = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    maskpx = jnp.ones((b, h, w), bool)

    mask = trainable_mask(params)
    trainables = {k: v for k, v in params.items() if mask[k]}
    stats = {k: v for k, v in params.items() if not mask[k]}
    cfg = LossConfig()

    def row(name, per, prev=None):
        marg = "" if prev is None else f"   marginal {(per - prev) * 1e3:8.3f} ms"
        print(f"{name:34s} {per * 1e3:9.3f} ms   {b / per:8.2f} stacks/s{marg}",
              flush=True)

    if args.mode == "components":
        def fwd_eval(x, p, d):
            return dffnet_apply(p, x.astype(dt), d, Ctx(train=False, compute_dtype=dt))

        def fwd_train(x, t, s, d):
            new_stats = {}
            ctx = Ctx(train=True, new_stats=new_stats, compute_dtype=dt)
            outs = dffnet_apply({**t, **s}, x.astype(dt), d, ctx)
            return outs, new_stats

        def loss_fn(t, x, s, d):
            outs, new_stats = fwd_train(x, t, s, d)
            outs = tuple(o.astype(jnp.float32) for o in outs[:4])
            batch = {"depth": depth, "mask": maskpx}
            tot, logs = total_loss(outs, batch, cfg)
            return tot, (new_stats, logs)

        def grads(x, t, s, d):
            (_, (new_stats, logs)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(t, x, s, d)
            return g, new_stats, logs["loss"]

        step = make_train_step(
            1e-4, cfg, compute_dtype=dt, donate=False,
            remat=(args.remat == "on"))
        state = create_train_state(params, lr=1e-4)

        def full_step(x, st, d):
            batch = {"fs": x, "depth": depth, "focus_dists": d, "mask": maskpx}
            new_state, logs = step(st, batch)
            # the chained output MUST depend on every updated param or XLA
            # dead-code-eliminates the unconsumed slices of the backward
            # (measured: returning one leaf made the "full step" 4x faster
            # than value_and_grad).  One scalar per leaf is ~20MB of reads —
            # noise against a b32 step.
            psum = sum(jnp.sum(v.astype(jnp.float32))
                       for v in new_state.params.values())
            return {"loss": logs["loss"], "psum": psum}

        prev = None
        for name, fn, extra in [
            ("fwd (eval BN)", fwd_eval, (params, fd)),
            ("fwd (train BN + new stats)",
             lambda x, t, s, d: fwd_train(x, t, s, d), (trainables, stats, fd)),
            ("fwd+bwd (value_and_grad)", grads, (trainables, stats, fd)),
            ("full step (+Adam, stat writeback)", full_step, (state, fd)),
        ]:
            per = device_loop_time(fn, fs, *extra, iters=args.iters)
            row(name, per, prev)
            prev = per
    else:
        prev = 0.0
        for upto in range(1, 13):
            def loss_fn(t, x, d, upto=upto):
                new_stats = {}
                ctx = Ctx(train=True, new_stats=new_stats, compute_dtype=dt)
                out = profile_prefix.stages({**t, **stats}, x.astype(dt), d,
                                            ctx, upto)
                leaves = (jax.tree_util.tree_leaves(out)
                          + jax.tree_util.tree_leaves(new_stats))
                return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                           for l in leaves)

            def fn(x, t, d, upto=upto):
                return jax.grad(loss_fn)(t, x, d)

            per = device_loop_time(fn, fs, trainables, fd, iters=args.iters)
            row(f"after {profile_prefix.NAMES[upto - 1]}", per, prev)
            prev = per


if __name__ == "__main__":
    main()
