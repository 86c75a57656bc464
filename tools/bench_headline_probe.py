"""Two cheap headline probes at the bench shape (10x384x384, bf16, XLA path).

1. ``--ladder``: does the XLA throughput keep scaling past b128?  bench.py has
   never tried b>128 for eval (the 128 cap came from the *train* ladder, where
   the backward working set binds; eval has no backward).
2. ``--precast``: the r5 b128 trace shows 17.7% of device time in async
   fp32->bf16 param-staging copies (reported overlapped).  A/B the same graph
   with params pre-cast to bf16 on device — if "overlapped" is real the delta
   is ~0; if the copies serialize anywhere the delta is the headline's
   cheapest win.

One JSON line per point (ONCHIP-queue style).
"""

from __future__ import annotations

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from dffx.models import Ctx, dffnet_apply, init_params, network_specs
from dffx.utils.profiling import device_loop_time, enable_persistent_cache

N, H, W = 10, 384, 384


def _inputs(rng, b):
    fs = jnp.asarray(rng.uniform(-1, 1, (b, N, H, W, 3)).astype(np.float16)
                     ).astype(jnp.bfloat16)
    fd = jnp.asarray(np.tile(np.linspace(0.2, 7.0, N, dtype=np.float32), (b, 1)))
    return fs, fd


def ladder(batches=(128, 160, 192, 224, 256)):
    enable_persistent_cache()
    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    ctx = Ctx(compute_dtype=jnp.bfloat16)

    def fwd(x, p, d):
        return dffnet_apply(p, x.astype(jnp.bfloat16), d, ctx)

    for b in batches:
        row = {"step": "eval_batch_ladder", "batch": b}
        try:
            fs, fd = _inputs(rng, b)
            per = device_loop_time(fwd, fs, params, fd, iters=max(2, 256 // b))
            row["ms"] = round(per * 1e3, 2)
            row["stacks_per_sec"] = round(b / per, 2)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:120]}"
        print(json.dumps(row), flush=True)


def precast(b=128):
    enable_persistent_cache()
    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    fs, fd = _inputs(rng, b)
    ctx = Ctx(compute_dtype=jnp.bfloat16)

    def fwd(x, p, d):
        return dffnet_apply(p, x.astype(jnp.bfloat16), d, ctx)

    row = {"step": "precast_ab", "batch": b}
    per32 = device_loop_time(fwd, fs, params, fd, iters=3)
    row["fp32_params_stacks_per_sec"] = round(b / per32, 2)
    # BN stats must stay fp32 (eval batch_norm folds them host-side into
    # scale/shift at trace time; bf16 running_var would lose precision), so
    # cast only conv/deconv weights — the tensors the trace shows staging.
    p16 = {k: (v.astype(jnp.bfloat16) if k.endswith(".weight") and v.ndim == 5
               else v) for k, v in params.items()}
    per16 = device_loop_time(fwd, fs, p16, fd, iters=3)
    row["bf16_params_stacks_per_sec"] = round(b / per16, 2)
    row["speedup"] = round(per32 / per16, 3)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    if "--precast" in sys.argv[1:]:
        precast()
    else:
        ladder()
