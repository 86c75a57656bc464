"""End-to-end (alignment + depth) forward latency at the bundled-scene shape.

On-device timing of ``flownet_apply`` (alignment only) and ``e2e_apply`` at
10x608x1088 bf16 — the ROADMAP item-2 operating point — with and without the
fused Pallas motion-head chain.

    python tools/bench_e2e.py [--hw 608 1088] [--n 10]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

from dffx.models import Ctx, e2e_apply, e2e_network_specs, flownet_apply, init_params
from dffx.utils.profiling import device_loop_time, enable_persistent_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[608, 1088])
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    enable_persistent_cache()
    h, w = args.hw
    n = args.n
    dt = jnp.dtype(args.dtype)
    params = init_params(e2e_network_specs(), seed=0)
    rng = np.random.default_rng(0)
    fs = jnp.asarray(rng.uniform(-1, 1, (1, n, h, w, 3)), dt)
    fovs = jnp.asarray(np.linspace(1.0, 1.02, n, dtype=np.float32)[None])
    fd = jnp.asarray(np.linspace(0.2, 7.0, n, dtype=np.float32)[None])

    for pallas in (False, True):
        ctx = Ctx(compute_dtype=dt, use_pallas=pallas, use_packed=pallas)

        def flow(x, p):
            return flownet_apply(p, x.astype(dt), fovs, ctx)

        def full(x, p):
            return e2e_apply(p, x.astype(dt), fd, fovs, ctx)

        t_flow = device_loop_time(flow, fs, params, iters=args.iters)
        t_full = device_loop_time(full, fs, params, iters=args.iters)
        print(f"pallas={pallas}:  flownet {t_flow * 1e3:8.2f} ms   "
              f"e2e {t_full * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
