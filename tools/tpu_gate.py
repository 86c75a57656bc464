"""On-device compiled-Pallas numerics gate (VERDICT round-1 weak #5).

CI runs the kernels interpret-mode only; Mosaic lowering regressions are
invisible there.  This gate compiles every fused kernel at every supported
eval shape on the real chip and compares against the XLA path in the same
dtype.  Run standalone:

    python tools/tpu_gate.py            # exits non-zero on any mismatch
    python tools/tpu_gate.py --smoke    # ~8-check subset, one shape per
                                        # kernel family (~2 min) — what
                                        # bench.py runs under its budget

or let bench.py invoke it (reported as the "pallas_gate" field).
"""

from __future__ import annotations

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

# (N, H, W) per dataset eval workload (SURVEY.md §6) + the bench shape —
# N matters: the SRD attention packs N*C channels into one block, and the
# Middlebury N=15 config is what first blew the VMEM budget
SHAPES = [(5, 256, 256), (10, 352, 256), (10, 384, 576), (10, 512, 512),
          (15, 544, 960), (10, 384, 384)]


def _check(name, got, ref, tol, failures):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = max(np.abs(ref).max(), 1e-6)
    err = np.abs(got - ref).max() / scale
    ok = bool(err < tol)
    if not ok:
        failures.append(f"{name}: rel err {err:.2e} >= {tol}")
    # progress to stderr so a hung remote compile is attributable to a check
    print(f"[gate] {name}: {'ok' if ok else f'FAIL {err:.2e}'}",
          file=sys.stderr, flush=True)
    return ok


def main(smoke: bool = False) -> int:
    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"pallas_gate": "skipped", "reason": "not on tpu"}))
        return 0

    from dffx.ops import batch_norm, conv3d
    from dffx.ops.pallas_kernels import (
        bn_fused_affine,
        fm_conv_bn_relu,
        motion_head_conv_chain,
        rb2d_residual,
        rb_of_chain,
        srd_attention_residual,
    )
    from dffx.utils.profiling import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    # both paths run in bf16; the fused kernels accumulate in fp32 while XLA
    # may not, so the comparison tolerance is bf16-scale
    tol = 3e-2
    failures: list[str] = []
    n_checks = 0

    # --smoke: one shape per kernel family so bench.py's in-budget gate
    # finishes in ~2 min; the full matrix stays the standalone default
    shapes = [(10, 384, 384)] if smoke else SHAPES
    for n, h, w in shapes:
        x3 = jnp.asarray(rng.uniform(-1, 1, (1, n, h, w, 3)), dt)
        wk = jnp.asarray(rng.standard_normal((1, 9, 9, 3, 8)) * 0.1, dt)
        g, b = jnp.ones(8), jnp.zeros(8)
        mu = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)
        va = jnp.asarray(rng.random(8) + 0.5, jnp.float32)
        scale, shift = bn_fused_affine(g, b, mu, va)
        try:
            got = jax.jit(lambda x: fm_conv_bn_relu(x, wk, scale, shift))(x3)
            ref = jax.jit(
                lambda x: jnp.maximum(
                    batch_norm(conv3d(x, wk, padding=(0, 8, 8), dilation=(1, 2, 2)),
                               mu, va, g, b), 0)
            )(x3)
            _check(f"fm@{h}x{w}", got, ref, tol, failures)
        except Exception as e:  # Mosaic compile failure IS a gate failure
            failures.append(f"fm@{h}x{w}: {type(e).__name__}: {str(e)[:120]}")
            print(f"[gate] fm@{h}x{w}: EXC {type(e).__name__}", file=sys.stderr, flush=True)
        n_checks += 1

        for c, hh, ww in [(8, h, w), (16, h // 2, w // 2), (32, h // 4, w // 4)]:
            if hh % 16 or ww < 32:
                continue
            x = jnp.asarray(rng.uniform(-1, 1, (1, n, hh, ww, c)), dt)
            w1 = jnp.asarray(rng.standard_normal((1, 3, 3, c, c)) * 0.1, dt)
            w2 = jnp.asarray(rng.standard_normal((1, 3, 3, c, c)) * 0.1, dt)
            aff = (jnp.ones(c), jnp.zeros(c))
            try:
                got = jax.jit(lambda x: rb2d_residual(x, w1, aff, w2, aff))(x)
                ref = jax.jit(
                    lambda x: jnp.maximum(
                        x + conv3d(jnp.maximum(conv3d(x, w1, padding=(0, 1, 1)), 0),
                                   w2, padding=(0, 1, 1)), 0)
                )(x)
                _check(f"rb2d c{c}@{hh}x{ww}", got, ref, tol, failures)
            except Exception as e:
                failures.append(f"rb2d c{c}@{hh}x{ww}: {type(e).__name__}: {str(e)[:120]}")
                print(f"[gate] rb2d c{c}@{hh}x{ww}: EXC {type(e).__name__}", file=sys.stderr, flush=True)
            n_checks += 1

            wn = jnp.asarray(rng.standard_normal((3, 1, 1, c, c)) * 0.1, dt)
            wx = jnp.asarray(rng.standard_normal((1, 1, 1, c, c)) * 0.1, dt)
            try:
                got = jax.jit(lambda x: srd_attention_residual(x, wn, wx))(x)
                ref = jax.jit(
                    lambda x: x + jnp.maximum(
                        conv3d(jnp.maximum(conv3d(x, wn, padding=(1, 0, 0)), 0), wx), 0)
                )(x)
                _check(f"attn c{c}@{hh}x{ww}", got, ref, tol, failures)
            except Exception as e:
                failures.append(f"attn c{c}@{hh}x{ww}: {type(e).__name__}: {str(e)[:120]}")
                print(f"[gate] attn c{c}@{hh}x{ww}: EXC {type(e).__name__}", file=sys.stderr, flush=True)
            n_checks += 1

    # motion-head chain at the E2E serving shapes (full-res conv3 head) —
    # bundled-scene 608x1088, a half-res variant, and a non-tile-multiple H.
    # (No c=32 conv2-head entry: the fused chain at c=32 measured ~22.5 ms
    # isolated vs XLA's 12.4 ms in-context marginal and a ~5 min Mosaic
    # compile — rejected in round 4, the serving path keeps XLA there.)
    mhead_shapes = [(10, 608, 1088, 18, 16), (10, 304, 544, 18, 16),
                    (4, 200, 352, 18, 16)]
    if smoke:
        mhead_shapes = mhead_shapes[1:2]
    for n, h, w, cin, c in mhead_shapes:
        xm = jnp.asarray(rng.uniform(-1, 1, (1, n, h, w, cin)), dt)
        ws = [jnp.asarray(rng.standard_normal((1, 3, 3, ci, co)) * 0.15, dt)
              for ci, co in [(cin, c), (c, c), (c, c), (c, 3)]]
        bns = []
        for _ in range(3):
            mu2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
            va2 = jnp.asarray(rng.random(c) + 0.5, jnp.float32)
            bns.append((jnp.ones(c), jnp.zeros(c), mu2, va2))
        bias3 = jnp.asarray(rng.standard_normal(3), jnp.float32)
        try:
            got = jax.jit(lambda x: motion_head_conv_chain(
                x, ws[0], bn_fused_affine(*bns[0]), ws[1], bn_fused_affine(*bns[1]),
                ws[2], bn_fused_affine(*bns[2]), ws[3], bias3))(xm)

            def ref_fn(x):
                y = x
                for wk, bn in zip(ws[:3], bns):
                    y = jnp.maximum(
                        batch_norm(conv3d(y, wk, padding=(0, 1, 1)), bn[2], bn[3],
                                   bn[0], bn[1]), 0)
                return conv3d(y, ws[3], padding=(0, 1, 1)) + bias3

            ref = jax.jit(ref_fn)(xm)
            _check(f"mhead c{c}@{h}x{w}", got, ref, tol, failures)
        except Exception as e:
            failures.append(f"mhead c{c}@{h}x{w}: {type(e).__name__}: {str(e)[:120]}")
            print(f"[gate] mhead c{c}@{h}x{w}: EXC {type(e).__name__}", file=sys.stderr, flush=True)
        n_checks += 1

    # rb_of_chain at the E2E serving shapes (ADVICE r4 medium: the fused
    # pyramid chain became the default serving path with no compiled-numerics
    # entry).  Configs mirror alignnet._rb_of_stack_apply's real uses: the
    # full-res 2-block (3->8),(8->8) chain and the half-res single-block
    # (16->16) tail, plus one fp32 run for dtype coverage.
    rbof_cfgs = [
        ("rbof2 3-8-8@608x1088", 10, 608, 1088, [(3, 8), (8, 8)], dt),
        ("rbof1 16-16@304x544", 10, 304, 544, [(16, 16)], dt),
        ("rbof1 32-32@152x272", 10, 152, 272, [(32, 32)], dt),  # non-x16 H:
        # the quarter-res fe3 tail at the 608-high serving shape (the H%16
        # gate drop, ADVICE r4) — exercises the in-kernel H tail padding
        ("rbof2 3-8-8@304x544 f32", 10, 304, 544, [(3, 8), (8, 8)], jnp.float32),
    ]
    if smoke:
        rbof_cfgs = [("rbof2 3-8-8@304x544", 10, 304, 544, [(3, 8), (8, 8)], dt)]
    for name, n, h, w, chans, rdt in rbof_cfgs:
        xr = jnp.asarray(rng.uniform(-1, 1, (1, n, h, w, chans[0][0])), rdt)
        blocks, bn_params = [], []
        for ci, co in chans:
            w1 = jnp.asarray(rng.standard_normal((1, 3, 3, ci, co)) * 0.15, rdt)
            w2 = jnp.asarray(rng.standard_normal((1, 3, 3, co, co)) * 0.15, rdt)
            wsh = jnp.asarray(rng.standard_normal((1, 1, 1, ci, co)) * 0.15, rdt)
            bns = []
            for _ in range(2):
                mu2 = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)
                va2 = jnp.asarray(rng.random(co) + 0.5, jnp.float32)
                bns.append((jnp.ones(co), jnp.zeros(co), mu2, va2))
            bn_params.append(bns)
            blocks.append((w1, bn_fused_affine(*bns[0]),
                           w2, bn_fused_affine(*bns[1]), wsh))
        # like-for-like precision: the kernels run HIGHEST for fp32 inputs,
        # so the XLA twin must too (at default precision the *reference*
        # is the bf16-rounded side and the comparison fails spuriously)
        ref_prec = (jax.lax.Precision.HIGHEST if rdt == jnp.float32 else None)
        try:
            got = jax.jit(lambda x: rb_of_chain(x, tuple(blocks)))(xr)

            def ref_fn(x):
                for (w1, _, w2, _, wsh), bns in zip(blocks, bn_params):
                    y = jnp.maximum(batch_norm(
                        conv3d(x, w1, padding=(0, 1, 1), precision=ref_prec),
                        bns[0][2], bns[0][3], bns[0][0], bns[0][1]), 0)
                    y = batch_norm(conv3d(y, w2, padding=(0, 1, 1),
                                          precision=ref_prec),
                                   bns[1][2], bns[1][3], bns[1][0], bns[1][1])
                    x = jnp.maximum(conv3d(x, wsh, precision=ref_prec) + y, 0)
                return x

            ref = jax.jit(ref_fn)(xr)
            _check(name, got, ref, tol if rdt == dt else 1e-4, failures)
        except Exception as e:
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            print(f"[gate] {name}: EXC {type(e).__name__}", file=sys.stderr, flush=True)
        n_checks += 1

    status = "pass" if not failures else "fail"
    print(json.dumps({"pallas_gate": status, "checks": n_checks,
                      "failures": failures}))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main(smoke="--smoke" in sys.argv[1:]))
