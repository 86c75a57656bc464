"""Per-eval-shape batch-1 latency: fused-Pallas path vs XLA path, on chip.

The fused path is the batch-1/latency serving path; this tool checks it wins
at every dataset's real resolution (VERDICT round-1: the envelope silently
excluded most of them).  Prints one JSON line per shape.

    python tools/bench_shapes.py
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from dffx.models import Ctx, dffnet_apply, init_params, network_specs
from dffx.utils.profiling import device_loop_time, enable_persistent_cache

# (name, N, H, W) per SURVEY.md §6 eval workloads (padded shapes)
WORKLOADS = [
    ("DefocusNet", 5, 256, 256),
    ("Smartphone", 10, 352, 256),
    ("DDFF", 10, 384, 576),
    ("4D_Light_Field", 10, 512, 512),
    ("Middlebury", 15, 544, 960),
    ("bench", 10, 384, 384),
]


# --spatial-model: the per-shard compute term of spatial-sharded serving,
# measurable on ONE chip (VERDICT r3 item 5).  T_spatial_N(XLA) ~=
# T_xla(H/N + halo rows) + ICI halo time; the halo exchanges are a few rows x
# W x C ppermutes per conv stage (~50 stages x O(10us) on v5e ICI << 1 ms), so
# comparing T_xla(half shape) against T_pallas(full shape) decides whether
# --spatial 2/4 XLA can beat the single-chip fused path.  Shard heights are
# rounded UP to x32 (272 -> 288 etc.), which over-counts shard compute a
# little — conservative in the fused path's favor.
SPATIAL_MODEL_WORKLOADS = [
    ("Middlebury_full", 15, 544, 960),
    ("Middlebury_halfshard", 15, 288, 960),
    ("Middlebury_quartershard", 15, 160, 960),
]
SPATIAL_MODEL_E2E = [
    ("E2E_full", 10, 608, 1088),
    ("E2E_halfshard", 10, 320, 1088),
    ("E2E_quartershard", 10, 160, 1088),
]


def spatial_model():
    from dffx.models import e2e_apply, e2e_network_specs

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    jobs = [(dffnet_apply, init_params(network_specs(), seed=0), False, wl)
            for wl in SPATIAL_MODEL_WORKLOADS]
    jobs += [(e2e_apply, init_params(e2e_network_specs(), seed=0), True, wl)
             for wl in SPATIAL_MODEL_E2E]
    for apply_fn, params, e2e, (name, n, h, w) in jobs:
        fs = jnp.asarray(rng.uniform(-1, 1, (1, n, h, w, 3)).astype(np.float32))
        fd = jnp.asarray(np.linspace(0.2, 7.0, n, dtype=np.float32)[None])
        fovs = jnp.asarray(np.linspace(1.0, 1.02, n, dtype=np.float32)[None])
        row = {"workload": name, "shape": f"{n}x{h}x{w}"}
        for key, pallas in [("xla_ms", False), ("pallas_packed_ms", True)]:
            ctx = Ctx(compute_dtype=jnp.bfloat16, use_pallas=pallas,
                      use_packed=pallas)

            def fwd(x, p, d):
                x = x.astype(jnp.bfloat16)
                return (e2e_apply(p, x, d, fovs, ctx) if e2e
                        else dffnet_apply(p, x, d, ctx))

            try:
                per = device_loop_time(fwd, fs, params, fd, iters=6)
                row[key] = round(per * 1e3, 2)
            except Exception as e:
                row[key] = f"FAILED {type(e).__name__}"
        print(json.dumps(row), flush=True)


def batch_ladder():
    """Fused(+packed) vs XLA at serving batch sizes (VERDICT r4 item 2).

    The "XLA wins at batch" policy was measured in r2/r3 with kernels that
    are now ~1.9x faster (ky-shift, r4).  This re-asks the question at the
    bench shape 10x384x384 for b in {16, 32, 64, 128}; the winner per batch
    is what bench.py should run.
    """
    enable_persistent_cache()
    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    n, h, w = 10, 384, 384
    fd_row = np.linspace(0.2, 7.0, n, dtype=np.float32)
    for b in (16, 32, 64, 128):
        # build in bf16 directly — a fp32 staging copy at b128 is ~700 MB
        fs = jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float16)
                         ).astype(jnp.bfloat16)
        fd = jnp.asarray(np.tile(fd_row, (b, 1)))
        row = {"workload": "bench_batch", "batch": b, "shape": f"{n}x{h}x{w}"}
        iters = max(2, 64 // b)
        for key, pallas in [("xla_ms", False), ("pallas_packed_ms", True)]:
            ctx = Ctx(compute_dtype=jnp.bfloat16, use_pallas=pallas,
                      use_packed=pallas)

            def fwd(x, p, d):
                return dffnet_apply(p, x.astype(jnp.bfloat16), d, ctx)

            try:
                per = device_loop_time(fwd, fs, params, fd, iters=iters)
                row[key] = round(per * 1e3, 2)
                row[key.replace("_ms", "_stacks_per_sec")] = round(b / per, 2)
            except Exception as e:
                row[key] = f"FAILED {type(e).__name__}"
        print(json.dumps(row), flush=True)


def main():
    import sys

    if "--spatial-model" in sys.argv[1:]:
        spatial_model()
        return
    if "--batch-ladder" in sys.argv[1:]:
        batch_ladder()
        return
    enable_persistent_cache()
    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    for name, n, h, w in WORKLOADS:
        fs = jnp.asarray(rng.uniform(-1, 1, (1, n, h, w, 3)).astype(np.float32))
        fd = jnp.asarray(np.linspace(0.2, 7.0, n, dtype=np.float32)[None])
        row = {"workload": name, "shape": f"{n}x{h}x{w}"}
        for key, pallas, packed in [("xla_ms", False, False),
                                    ("pallas_ms", True, False),
                                    ("pallas_packed_ms", True, True)]:
            ctx = Ctx(compute_dtype=jnp.bfloat16, use_pallas=pallas,
                      use_packed=packed)

            def fwd(x, p, d):
                return dffnet_apply(p, x.astype(jnp.bfloat16), d, ctx)

            try:
                per = device_loop_time(fwd, fs, params, fd, iters=10)
                row[key] = round(per * 1e3, 2)
            except Exception as e:
                row[key] = f"FAILED {type(e).__name__}"
        best = row.get("pallas_packed_ms", row.get("pallas_ms"))
        if isinstance(row.get("xla_ms"), float) and isinstance(best, float):
            row["speedup"] = round(row["xla_ms"] / best, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
