"""Training-step throughput on the current backend.

Times the full jitted train step (fwd + bwd + Adam + BN stat updates) at the
DDFF recipe's crop (224x224, N=10) across batch sizes and compute dtypes.

    python tools/bench_train.py
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from dffx.models import init_params, network_specs
from dffx.train import LossConfig, create_train_state, make_train_step
from dffx.utils.profiling import enable_persistent_cache


#: v5e peak bf16 MXU throughput (TFLOP/s) — the MFU denominator
V5E_PEAK_TFLOPS = 197.0


def mfu(batch: int = 128, remat=True, dtype=jnp.bfloat16, donate=False,
        sanitize=False):
    """Train-side utilization accounting at the record operating point
    (VERDICT r4 item 6: eval has an MFU figure, train had none).  FLOPs come
    from XLA's own cost analysis of the compiled step; the wall clock is the
    same value-fetch-synced loop the ladder uses."""
    import time

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    n, h, w = 10, 224, 224
    params = init_params(network_specs(), seed=0)
    bdata = {
        "fs": jnp.asarray(
            rng.uniform(-1, 1, (batch, n, h, w, 3)).astype(np.float16)
        ).astype(dtype),
        "depth": jnp.asarray(rng.uniform(0, 1, (batch, h, w)).astype(np.float32)),
        "focus_dists": jnp.asarray(
            np.tile(np.linspace(0, 1, n, dtype=np.float32), (batch, 1))),
        "mask": jnp.ones((batch, h, w), bool),
    }
    step = make_train_step(1e-4, LossConfig(), compute_dtype=dtype,
                           donate=donate, remat=remat, sanitize=sanitize)
    state = create_train_state(params, lr=1e-4)
    compiled = step.lower(state, bdata).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", float("nan")))
    state, logs = compiled(state, bdata)
    float(logs["loss"])
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters):
        state, logs = compiled(state, bdata)
    float(logs["loss"])
    per = (time.perf_counter() - t0) / iters
    tflops = flops / per / 1e12
    print(json.dumps({
        "batch": batch, "remat": remat, "donate": donate, "sanitize": sanitize,
        "ms_per_step": round(per * 1e3, 1),
        "stacks_per_sec": round(batch / per, 2),
        "step_tflop": round(flops / 1e12, 2),
        "tflops_per_sec": round(tflops, 2),
        "mfu_pct_vs_bf16_peak": round(100 * tflops / V5E_PEAK_TFLOPS, 1),
        "bytes_accessed_gb": round(
            float(cost.get("bytes accessed", float("nan"))) / 1e9, 2),
    }), flush=True)


def e2e_ladder(hw=(608, 1088), points=None):
    """Deep-remat justify-or-delete (VERDICT r4 item 4): full-resolution E2E
    training — the one plausible workload where freeing the long-range skips
    should matter (e2e_apply stores the full-res pyramid skips; at the
    10x608x1088 scene shape one fp32 fs alone is 793 MB).  Rows: selective
    vs deep remat at the largest batches each mode can compile.  Measured
    r5: at 608x1088 NO point compiles in EITHER mode (tpu_compile_helper
    exit 1, b1-b4) — pass --hw to bisect the resolution boundary.  At
    448x800 selective b1 ran (1256.7 ms/step) while deep b1 FAILED to
    compile — deep's fused front span makes the peak working set larger,
    not smaller, which is why the mode was deleted (ONCHIP_r05.jsonl);
    the deep rows here are retired with it."""
    import time

    from dffx.models import e2e_network_specs

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    n, (h, w) = 10, hw
    params = init_params(e2e_network_specs(), seed=0)
    for batch, remat in points or [(1, True), (2, True), (4, True)]:
        bdata = {
            "fs": jnp.asarray(
                rng.uniform(-1, 1, (batch, n, h, w, 3)).astype(np.float16)
            ).astype(jnp.bfloat16),
            "depth": jnp.asarray(rng.uniform(0, 1, (batch, h, w)).astype(np.float32)),
            "focus_dists": jnp.asarray(
                np.tile(np.linspace(0.2, 7.0, n, dtype=np.float32), (batch, 1))),
            "mask": jnp.ones((batch, h, w), bool),
            "fovs": jnp.asarray(
                np.tile(np.linspace(1.0, 1.02, n, dtype=np.float32), (batch, 1))),
        }
        step = make_train_step(1e-4, LossConfig(), e2e=True,
                               compute_dtype=jnp.bfloat16, donate=False,
                               remat=remat)
        state = create_train_state(params, lr=1e-4)
        row = {"workload": f"e2e_train_{h}x{w}", "batch": batch, "remat": remat}
        try:
            state, logs = step(state, bdata)  # compile
            float(logs["loss"])
            t0 = time.perf_counter()
            iters = 4
            for _ in range(iters):
                state, logs = step(state, bdata)
            float(logs["loss"])
            per = (time.perf_counter() - t0) / iters
            row["ms_per_step"] = round(per * 1e3, 1)
            row["stacks_per_sec"] = round(batch / per, 2)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:150]}"
        print(json.dumps(row), flush=True)


def main():
    import sys

    if "--mfu" in sys.argv[1:]:
        mfu()
        return
    if "--sanitize-ab" in sys.argv[1:]:
        # dffx.utils.sanitize claims the in-graph NaN/Inf grad counter is
        # "~free against a ~700 ms step" — measure it at the b128 record
        # point with the production config (donate=True, the CLI default).
        # sanitize=True also keeps the grad tree in logs (fetched lazily on
        # trigger only), so this A/B prices the whole --sanitize flag, not
        # just the reduction.
        mfu(donate=True, sanitize=False)
        mfu(donate=True, sanitize=True)
        return
    if "--donate-ab" in sys.argv[1:]:
        # VERDICT r4 item 6's "one measured lever": the recorded MFU point ran
        # donate=False, but the production CLI trains with donate=True
        # (loop.py default) — A/B both at the b128 record point.
        mfu(donate=False)
        mfu(donate=True)
        return
    if "--e2e-ladder" in sys.argv[1:]:
        argv = sys.argv[1:]
        hw = (608, 1088)
        if "--hw" in argv:
            i = argv.index("--hw")
            hw = (int(argv[i + 1]), int(argv[i + 2]))
        e2e_ladder(hw=hw)
        return
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    n, h, w = 10, 224, 224
    params = init_params(network_specs(), seed=0)

    # batch>=64 requires remat=True (b48 plain fails to compile at 16 GiB);
    # measured r3: b32 plain 55 stacks/s, b64+remat 93, b128+remat 182 —
    # stage remat frees the activation HBM that batch-scaling the MXU needs
    # b128 is the measured batch ceiling (r4: b144/b160 selective fail to
    # compile, b256 OOMs — the per-stage backward working set, ~980 MB bf16
    # half-res temps, exceeds 16 GB HBM).  The deep-remat rows that probed
    # b160-b224 are retired with the mode's r5 deletion: deep was slower at
    # every batch that compiled AND failed to compile where selective fits.
    for batch, dtype, remat in [(4, jnp.float32, False), (4, jnp.bfloat16, False),
                                (32, jnp.bfloat16, False), (32, jnp.bfloat16, True),
                                (64, jnp.bfloat16, True), (128, jnp.bfloat16, True)]:
        bdata = {
            # staged fp16→bf16 (a b256 fp32 staging copy alone is 6 GB)
            "fs": jnp.asarray(
                rng.uniform(-1, 1, (batch, n, h, w, 3)).astype(np.float16)
            ).astype(jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32),
            "depth": jnp.asarray(rng.uniform(0, 1, (batch, h, w)).astype(np.float32)),
            "focus_dists": jnp.asarray(
                np.tile(np.linspace(0, 1, n, dtype=np.float32), (batch, 1))),
            "mask": jnp.ones((batch, h, w), bool),
        }
        step = make_train_step(1e-4, LossConfig(), compute_dtype=dtype,
                               donate=False, remat=remat)
        state = create_train_state(params, lr=1e-4)
        row = {"batch": batch, "dtype": str(jnp.dtype(dtype).name), "remat": remat}
        try:
            import time

            state, logs = step(state, bdata)  # compile
            float(logs["loss"])
            t0 = time.perf_counter()
            iters = 8
            for _ in range(iters):
                state, logs = step(state, bdata)
            # a VALUE fetch is the only honest sync through the TPU tunnel —
            # block_until_ready returns on the enqueue ack there
            float(logs["loss"])
            per = (time.perf_counter() - t0) / iters
            row["ms_per_step"] = round(per * 1e3, 1)
            row["stacks_per_sec"] = round(batch / per, 2)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:150]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
