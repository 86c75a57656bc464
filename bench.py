"""Headline benchmark: focal-stack inference throughput on one TPU chip.

Workload matches BASELINE.json: DFFNet forward on a 10-slice 384x384 stack
(the DDFF-12-shaped eval workload).  Prints ONE JSON line:

    {"metric": ..., "value": stacks/sec/chip, "unit": ..., "vs_baseline": x}

``vs_baseline`` is the speedup over the reference PyTorch implementation run
on CPU (the only hardware the reference can use here), measured once and
cached in ``.bench_cpu_baseline.json``.  North star: >= 10x.
"""

import json
import os
import sys
import time

import numpy as np

N, H, W = 10, 384, 384
BATCH = 1
WARMUP = 3
ITERS = 20
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")


def bench_dffx() -> dict:
    import jax
    import jax.numpy as jnp

    from dffx.models import Ctx, dffnet_apply, init_params, network_specs

    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    fs = jnp.asarray(rng.uniform(-1, 1, (BATCH, N, H, W, 3)).astype(np.float32))
    fd = jnp.asarray(np.tile(np.linspace(0.2, 7.0, N, dtype=np.float32), (BATCH, 1)))

    results = {}
    for name, dtype in [("bf16", jnp.bfloat16), ("fp32", jnp.float32)]:
        fwd = jax.jit(
            lambda p, x, d, dt=dtype: dffnet_apply(p, x.astype(dt), d, Ctx(compute_dtype=dt))[3]
        )
        out = jax.block_until_ready(fwd(params, fs, fd))
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
        for _ in range(WARMUP):
            jax.block_until_ready(fwd(params, fs, fd))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fwd(params, fs, fd)
        jax.block_until_ready(out)
        dt_s = (time.perf_counter() - t0) / ITERS
        results[name] = BATCH / dt_s
    results["platform"] = jax.devices()[0].platform
    return results


def bench_reference_cpu() -> float:
    """Reference PyTorch model, CPU, same workload. Cached across runs."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["stacks_per_sec"]
    ref_dir = "/root/reference/Depth_Estimation_Test"
    if not os.path.isdir(ref_dir):
        return float("nan")
    sys.path.insert(0, ref_dir)
    import torch

    from Depth_Estimation_Network import Network  # reference, read-only import

    torch.manual_seed(0)
    model = Network().eval()
    fs = torch.rand(BATCH, 3, N, H, W) * 2 - 1
    fd = torch.rand(BATCH, N, H, W)
    with torch.no_grad():
        model(fs, fd)  # warmup
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            model(fs, fd)
        per = (time.perf_counter() - t0) / iters
    sps = BATCH / per
    with open(CACHE, "w") as f:
        json.dump({"stacks_per_sec": sps, "seconds_per_stack": per}, f)
    return sps


def main():
    ours = bench_dffx()
    base = bench_reference_cpu()
    value = ours["bf16"]
    vs = value / base if base == base else None  # NaN-safe
    print(
        json.dumps(
            {
                "metric": "focal stacks/sec/chip (10x384x384 DFFNet fwd, bf16)",
                "value": round(value, 3),
                "unit": "stacks/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
                "fp32_stacks_per_sec": round(ours["fp32"], 3),
                "torch_cpu_stacks_per_sec": round(base, 4) if base == base else None,
                "platform": ours["platform"],
            }
        )
    )


if __name__ == "__main__":
    main()
