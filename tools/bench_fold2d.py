"""In-context A/B for the DFFX_FOLD2D (1,k,k)->2D conv fold (VERDICT r4 #3).

The fold hook lives in dffx/ops/conv.py and is read at import time, so the
A and B arms are separate processes:

    PYTHONPATH=... DFFX_FOLD2D=0 python tools/bench_fold2d.py
    PYTHONPATH=... DFFX_FOLD2D=1 python tools/bench_fold2d.py

Times the FULL jitted b128 headline forward (10x384x384 bf16, XLA path) —
the r2 house rule: isolated op benches reversed direction four times, only
whole-graph numbers count.  One process at a time on the TPU.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax.numpy as jnp

from dffx.models import Ctx, dffnet_apply, init_params, network_specs
from dffx.utils.profiling import device_loop_time, enable_persistent_cache


def main():
    enable_persistent_cache()
    batch, n, h, w = 128, 10, 384, 384
    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    fs = jnp.asarray(
        rng.uniform(-1, 1, (batch, n, h, w, 3)).astype(np.float16)
    ).astype(jnp.bfloat16)
    fd = jnp.asarray(np.tile(np.linspace(0.2, 7.0, n, dtype=np.float32), (batch, 1)))
    ctx = Ctx(compute_dtype=jnp.bfloat16, use_pallas=False, use_packed=False)

    import jax

    @jax.jit
    def fwd(x, p, d):
        return dffnet_apply(p, x, d, ctx)

    per = device_loop_time(fwd, fs, params, fd, iters=3)
    print(json.dumps({
        "fold2d": os.environ.get("DFFX_FOLD2D", "") == "1",
        "batch": batch,
        "ms_per_iter": round(per * 1e3, 1),
        "stacks_per_sec": round(batch / per, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
