"""Headline benchmark: focal-stack inference throughput on one TPU chip.

Workload matches BASELINE.json: DFFNet forward on 10-slice 384x384 stacks
(the DDFF-12-shaped eval workload).  Prints ONE JSON line:

    {"metric": ..., "value": stacks/sec/chip, "unit": ..., "vs_baseline": x}

Timing is *on-device*: K forwards are chained inside one XLA program through a
data dependency (host-side timing of async dispatch through the TPU tunnel can
be wrong by 100x — see dffx.utils.profiling.device_loop_time).  ``value`` is
the best over batch sizes {1, 4, 128} in bf16; Pallas vs XLA is measured
per operating point and the winner kept.
``vs_baseline`` is the speedup over the reference PyTorch implementation on
CPU (the only hardware the reference can use here), measured once and cached.
North star: >= 10x.
"""

import json
import os
import sys
import time

import numpy as np

N, H, W = 10, 384, 384
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")


def bench_dffx(progress=None) -> dict:
    """Forward bench over the three operating points.  ``progress``, if
    given, is called with the partial results dict after each point — main()
    uses it to print an interim-but-valid headline line, so even a kill
    during a later compile leaves a graded record."""
    import jax
    import jax.numpy as jnp

    from dffx.models import Ctx, dffnet_apply, init_params, network_specs
    from dffx.utils.profiling import device_loop_time, enable_persistent_cache

    enable_persistent_cache()
    params = init_params(network_specs(), seed=0)
    rng = np.random.default_rng(0)
    on_tpu = jax.devices()[0].platform == "tpu"

    results = {"platform": jax.devices()[0].platform}
    best = 0.0
    # three operating points: batch 1 (request latency; the Pallas fused path
    # + packed tail win there), batch 4 (the reference's train batch), and
    # batch 128 (serving throughput — XLA's conv lowerings keep scaling with
    # batch on v5e, ~47 TFLOP/s at batch*N=1280 vs ~6 at batch 4;
    # wall-clock-verified, tools/bench_formulations.py history).  The remote
    # Mosaic compile service can fail under load, so a Pallas config falls
    # back to the (always-compilable) XLA path; the big batch falls back to
    # smaller ones if HBM is tighter than on the measured chip.
    # batch 4: measure BOTH configs and keep the winner — the per-shape table
    # (PARITY.md) shows Pallas winning at batch 1 on every shape, so the b4
    # operating point must be chosen by measurement, not assumption.
    # batch 128 XLA-only is ALSO a measurement, re-made after the r4 ky-shift
    # kernel speedup (tools/bench_shapes.py --batch-ladder, round 5): fused+
    # packed wins at b16 (61.7 vs 52.7 stacks/s) but loses at b32 (68.9 vs
    # 90.4) and fails to run at b64/b128 (channel-first staging exceeds HBM);
    # XLA b128 = 334.2.  The fused kernels remain latency tools.
    for batch, iters, pallas in [(1, 20, on_tpu), (4, 8, "both" if on_tpu else False),
                                 (128, 3, False)]:
        attempts = [(batch, True), (batch, False)] if pallas else [(batch, False)]
        if batch > 4:
            attempts += [(64, False), (32, False)]
        per, used_batch = None, batch
        timed = {}  # (bsz, use_pallas) -> seconds/iter, for the "both" mode
        for i, (bsz, use_pallas) in enumerate(attempts):
            # big batches are built in bf16 directly — a fp32 staging copy of
            # (128,10,384,384,3) alone would blow past HBM
            fs = jnp.asarray(
                rng.uniform(-1, 1, (bsz, N, H, W, 3)).astype(np.float16)
            ).astype(jnp.bfloat16)
            fd = jnp.asarray(np.tile(np.linspace(0.2, 7.0, N, dtype=np.float32), (bsz, 1)))
            # the packed (s2d) tail wins at latency batch sizes, loses ~4% at
            # batch 64 — tie it to the Pallas/latency config
            ctx = Ctx(compute_dtype=jnp.bfloat16, use_pallas=use_pallas,
                      use_packed=use_pallas)

            def fwd(x, p, d):
                # all four heads: the reference forward computes mid/p1/p2/p3,
                # so the benched XLA program must too (device_loop_time sums
                # every output leaf, defeating dead-code elimination)
                return dffnet_apply(p, x.astype(jnp.bfloat16), d, ctx)

            try:
                t = device_loop_time(fwd, fs, params, fd, iters=iters)
                timed[(bsz, use_pallas)] = t
                if per is None or t < per:
                    per, used_batch = t, bsz
                if pallas != "both":
                    break
            except Exception:  # Mosaic compile-service failure / OOM
                if i == len(attempts) - 1 and per is None:
                    raise  # the plain XLA config must compile; don't mask it
                print(f"# config (batch {bsz}, pallas={use_pallas}) failed; "
                      "falling back", file=sys.stderr)
        sps = used_batch / per
        results[f"b{batch}_stacks_per_sec"] = round(sps, 2)
        if pallas == "both" and len(timed) == 2:
            results[f"b{batch}_pallas_stacks_per_sec"] = round(
                batch / timed[(batch, True)], 2)
            results[f"b{batch}_xla_stacks_per_sec"] = round(
                batch / timed[(batch, False)], 2)
        if used_batch != batch:
            # HBM fallback ran a smaller batch — record it so the artifact
            # never silently relabels a batch-64 number as batch-128
            results[f"b{batch}_actual_batch"] = used_batch
        best = max(best, sps)
        results["best"] = best
        if progress is not None:
            progress(results)
    return results


def bench_train(b: int = 32, remat: bool = False) -> float:
    """Train-step throughput (stacks/s) at the reference DDFF recipe crop
    (224^2, N=10, bf16 fwd+bwd+Adam).  Two recorded operating points: b32
    plain (the VERDICT r2 item-1 point, comparable across rounds) and b128
    with selective stage remat — the round-3 throughput point (b>=48 doesn't
    compile without remat; see dffx.train.loop.make_train_step)."""
    import jax.numpy as jnp
    import numpy as np

    from dffx.models import init_params, network_specs
    from dffx.train import LossConfig, create_train_state, make_train_step
    from dffx.utils.profiling import device_loop_time

    rng = np.random.default_rng(0)
    n, h, w = 10, 224, 224
    params = init_params(network_specs(), seed=0)
    step = make_train_step(1e-4, LossConfig(), compute_dtype=jnp.bfloat16,
                           donate=False, remat=remat)
    state = create_train_state(params, lr=1e-4)
    depth = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    maskpx = jnp.ones((b, h, w), bool)
    fd = jnp.asarray(np.tile(np.linspace(0, 1, n, dtype=np.float32), (b, 1)))
    fs = jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float16)
                     ).astype(jnp.bfloat16)

    def fn(x, st):
        new_state, logs = step(st, {"fs": x, "depth": depth,
                                    "focus_dists": fd, "mask": maskpx})
        # must consume every updated param or XLA DCEs backward slices
        psum = sum(jnp.sum(v.astype(jnp.float32))
                   for v in new_state.params.values())
        return {"loss": logs["loss"], "psum": psum}

    per = device_loop_time(fn, fs, state, iters=4)
    return b / per


def bench_e2e() -> float:
    """E2E (alignment + depth) forward latency (ms/stack) at the bundled-scene
    shape 10x608x1088 bf16 with the fused fast paths — ROADMAP item 2."""
    import jax.numpy as jnp
    import numpy as np

    from dffx.models import Ctx, e2e_apply, e2e_network_specs, init_params
    from dffx.utils.profiling import device_loop_time

    params = init_params(e2e_network_specs(), seed=0)
    rng = np.random.default_rng(0)
    n, h, w = 10, 608, 1088
    fs = jnp.asarray(rng.uniform(-1, 1, (1, n, h, w, 3)), jnp.bfloat16)
    fovs = jnp.asarray(np.linspace(1.0, 1.02, n, dtype=np.float32)[None])
    fd = jnp.asarray(np.linspace(0.2, 7.0, n, dtype=np.float32)[None])
    ctx = Ctx(compute_dtype=jnp.bfloat16, use_pallas=True, use_packed=True)

    def fn(x, p):
        return e2e_apply(p, x.astype(jnp.bfloat16), fd, fovs, ctx)

    try:
        per = device_loop_time(fn, fs, params, iters=6)
    except Exception:  # Mosaic compile-service hiccup: report the XLA path
        ctx = Ctx(compute_dtype=jnp.bfloat16)
        per = device_loop_time(fn, fs, params, iters=6)
    return per * 1e3


def bench_simulator() -> float:
    """Simulator throughput (scenes/s, warm) on a synthetic NYU-sized scene —
    records the PARITY.md §2.4 claim in a bench artifact."""
    import numpy as np

    from dffx.sim import simulator as S

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (224, 352, 3)).astype(np.float64)
    depth = rng.uniform(0.1, 1.1, (224, 352))
    kwargs = dict(profile=S.DEVICE_PROFILES[0], rng=np.random.default_rng(1),
                  pixel_vs_meter=1 / 1.4e-6 * 352 / 4080, num_imgs=10)
    S.generate_scene(img, depth, **kwargs)  # warm (jit compiles)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        S.generate_scene(img, depth, **kwargs)
    return iters / (time.perf_counter() - t0)


def probe_backend(timeout: int = 240) -> str:
    """Device-init probe in a subprocess.

    The axon TPU backend blocks *forever* at init when its tunnel is down
    (observed: a multi-hour outage) — a hung bench leaves the round with no
    artifact at all.  Returns the platform string, or "unreachable" if init
    doesn't complete within ``timeout``.
    """
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    # explicit child env (don't fail open): same PYTHONPATH the parent uses,
    # so the child resolves the same jax backend the parent is about to init
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    # the parent expects a device platform when pinned via JAX_PLATFORMS OR
    # when the axon plugin is armed through sitecustomize (PYTHONPATH +
    # PALLAS_AXON_POOL_IPS) — a CPU-falling probe must not green-light either
    expected = env.get("JAX_PLATFORMS", "")
    if (not expected and env.get("PALLAS_AXON_POOL_IPS")
            and "axon_site" in env.get("PYTHONPATH", "")):
        expected = "axon"
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout, cwd=here, env=env,
        )
        plat = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if not plat:
            return "unreachable"
        if expected and expected != "cpu" and plat == "cpu":
            # the parent is pinned to a device platform but the probe child
            # fell back to CPU — the parent's own init could still hang
            return "unreachable"
        return plat
    except subprocess.TimeoutExpired:
        return "unreachable"


def run_pallas_gate(smoke: bool = True, timeout: int = 600) -> dict:
    """Compiled-Pallas-vs-XLA numerics on the chip (tools/tpu_gate.py), in a
    subprocess so a Mosaic crash can't take the bench down.

    The bench runs the ~8-check --smoke subset (one shape per kernel family,
    ~2 min) so the graded artifact fits the driver's clock; the full 40+
    check matrix stays in the standalone tool / the on-chip queue
    (VERDICT r4: an 8-minute in-bench gate is what pushed the r4 artifact
    past the driver's timeout)."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(here, "tools", "tpu_gate.py")]
    if smoke:
        cmd.append("--smoke")
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=here, env=env,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue  # stray brace-prefixed log line, keep looking
        return {"pallas_gate": "fail", "failures": [out.stderr[-500:]]}
    except subprocess.TimeoutExpired:
        return {"pallas_gate": "timeout"}


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
    fs = torch.rand(1, 3, N, H, W) * 2 - 1
    fd = torch.rand(1, N, H, W)
    with torch.no_grad():
        model(fs, fd)  # warmup
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            model(fs, fd)
        per = (time.perf_counter() - t0) / iters
    sps = 1.0 / per
    with open(CACHE, "w") as f:
        json.dump({"stacks_per_sec": sps, "seconds_per_stack": per}, f)
    return sps


def last_known_good(here: str | None = None) -> dict:
    """Most recent BENCH_r*.json with a non-null headline value, so a
    tunnel-outage round still carries the measured history inline.

    The driver writes BENCH_r*.json as a wrapper ``{"n", "cmd", "rc",
    "tail", "parsed"}`` where ``parsed`` (or a JSON line inside ``tail``)
    holds the bench record — unwrap before reading ``value``."""
    import glob
    import re

    def unwrap(rec):
        if not isinstance(rec, dict):
            return None
        if "value" in rec:
            return rec
        if isinstance(rec.get("parsed"), dict) and "value" in rec["parsed"]:
            return rec["parsed"]
        for line in reversed(str(rec.get("tail", "")).splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    inner = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(inner, dict) and "value" in inner:
                    return inner
        return None

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))

    def round_no(p: str) -> int:
        m = re.search(r"r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1  # digit-less names sort first

    best = {}
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                       key=round_no):
        try:
            with open(path) as f:
                rec = unwrap(json.load(f))
        except (OSError, json.JSONDecodeError):
            continue
        if rec is not None and rec.get("value") is not None:
            best = {"round": os.path.basename(path), **rec}
    return best


def main():
    # Wall-clock budget (VERDICT r4 item 1: the graded artifact must be
    # structurally un-losable — r4's bench grew to ~33 min and the driver
    # killed it at rc=124, losing every number).  Three defenses:
    #   1. the COMPLETE headline JSON prints immediately after the forward
    #      bench + cached CPU baseline — a later kill still leaves a valid
    #      record as the last JSON line (last_known_good reads exactly that);
    #   2. the full record is RE-printed after each enrichment section, so a
    #      mid-enrichment kill keeps everything finished so far;
    #   3. each optional section is skipped when the remaining budget can't
    #      cover its historical cost (r4 ONCHIP timings), and the in-bench
    #      pallas gate runs the ~2-min --smoke subset, not the 8-min matrix.
    budget = float(os.environ.get("DFFX_BENCH_BUDGET", "1200"))
    t0 = time.monotonic()

    def remaining() -> float:
        return budget - (time.monotonic() - t0)

    if probe_backend() == "unreachable":
        print(json.dumps({
            "metric": "focal stacks/sec/chip (10x384x384 DFFNet fwd, bf16, on-device timed)",
            "value": None, "unit": "stacks/s", "vs_baseline": None,
            "error": "device backend unreachable (TPU tunnel down) — "
                     "device init did not complete; last_known_good carries "
                     "the most recent measured artifact",
            "last_known_good": last_known_good(),
        }))
        sys.exit(1)
    base = bench_reference_cpu()  # CPU-side, cached — run first so interim
    # headline lines already carry vs_baseline

    def _headline(res: dict) -> dict:
        v = res.get("best", 0.0)
        r = {
            "metric": "focal stacks/sec/chip (10x384x384 DFFNet fwd, bf16, on-device timed)",
            "value": round(v, 2),
            "unit": "stacks/s",
            "vs_baseline": round(v / base, 2) if base == base else None,
            "platform": res.get("platform"),
        }
        for k in ("b1_stacks_per_sec", "b4_stacks_per_sec",
                  "b4_pallas_stacks_per_sec", "b4_xla_stacks_per_sec",
                  "b128_stacks_per_sec", "b128_pallas_stacks_per_sec",
                  "b128_xla_stacks_per_sec", "b128_actual_batch"):
            if k in res:
                r[k] = res[k]
        return r

    ours = bench_dffx(progress=lambda res: print(
        json.dumps({**_headline(res), "partial": True}), flush=True))
    record = _headline(ours)
    record["torch_cpu_stacks_per_sec"] = round(base, 4) if base == base else None
    print(json.dumps(record), flush=True)  # defense 1: complete headline, early

    on_tpu = ours["platform"] == "tpu"
    skipped: list = []

    def section(name: str, est_seconds: float, fn, tpu_only: bool = True):
        """Run one enrichment measurement under the budget, then re-print the
        whole record (defense 2); a failure records the error, not a crash."""
        if tpu_only and not on_tpu:
            return
        if remaining() < est_seconds:
            skipped.append(name)
            record["skipped_sections"] = skipped
            return
        try:
            record.update(fn())
        except Exception as e:
            print(f"# {name} bench failed: {e}", file=sys.stderr)
            record[name + "_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        record["bench_seconds"] = round(time.monotonic() - t0, 1)
        print(json.dumps(record), flush=True)

    # cost estimates are r4/r5 measured worst cases (cold compile cache);
    # order = grading value: numerics gate first, then the recorded perf
    # points.  (The b256 deep-remat probe is GONE: three rounds of
    # measurement say it cannot fit 16 GB HBM — ONCHIP_r04 train_ladder.)
    def _gate():
        g = run_pallas_gate(smoke=True, timeout=min(600, max(60, int(remaining()))))
        return {"pallas_gate": g.get("pallas_gate"),
                "pallas_gate_checks": g.get("checks"),
                "pallas_gate_failures": g.get("failures", [])[:5]}

    section("pallas_gate", 200, _gate)
    section("train_b128", 260,
            lambda: {"train_b128_remat_stacks_per_sec": round(bench_train(b=128, remat=True), 2)})
    section("e2e", 130, lambda: {"e2e_ms_per_stack": round(bench_e2e(), 2)})
    section("train_b32", 180,
            lambda: {"train_b32_stacks_per_sec": round(bench_train(), 2)})
    section("simulator", 90,
            lambda: {"simulator_scenes_per_sec": round(bench_simulator(), 3)},
            tpu_only=False)


if __name__ == "__main__":
    main()
