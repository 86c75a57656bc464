"""Settle ROADMAP item 2 (custom Pallas conv for the full-res tiny-channel
stages) by measuring the formulation ceiling instead of building the kernel.

Any Pallas conv for these stages bottoms out in MXU matmuls of a specific
shape; the achievable TFLOP/s of that *bare matmul* (no patch-building, no
rolls, no adds — an optimistic bound) caps what the kernel could ever reach:

* fm conv (1,9,9) dil2, 3->8 @ b128 full-res:
    - ky-shift im2col (the r4 kernels' trick): patches hold ky-row shifts only
      -> [M, 27] @ [27, 72] (27 = 3cin x 9ky, 72 = 8cout x 9kx), kx taps
      combined by lane rolls afterwards.
    - classic im2col: [M, 243] @ [243, 8].
* SRD rb2d conv (1,3,3) 8->8: ky-shift [M, 24] @ [24, 24]; im2col [M, 72] @ [72, 8].
* calibration: [M, 128] @ [128, 128] (dense fill) and an HBM-stream add.

Each row prints useful-FLOPs TFLOP/s; the conv rows also print the measured
in-isolation time of the *real* op at the b128 headline shape.  Verdict rule:
if conv_measured_tflops >= best_matmul_tflops x 0.85 the kernel cannot win
(the remaining 15% is less than the patch-build + roll overhead every real
kernel pays — the r4 ky-shift kernels spend ~25-35%% of their time outside
the dots).  One JSON line per row (ONCHIP-queue style).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from dffx.ops import conv3d
from dffx.utils.profiling import device_loop_time, enable_persistent_cache

B, N, H, W = 128, 10, 384, 384  # the b128 headline operating point


def _tflops(flops: float, sec: float) -> float:
    return round(flops / sec / 1e12, 2)


def probe_matmul(m: int, k: int, n: int, iters: int = 30) -> None:
    # inputs are generated ON DEVICE — multi-GB host arrays through the TPU
    # tunnel take minutes to transfer and look like a hang
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(ka, (m, k), dtype=jnp.bfloat16)
    b = jax.random.normal(kb, (k, n), dtype=jnp.bfloat16)

    def mm(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    sec = device_loop_time(mm, a, b, iters=iters)
    row = {
        "step": "mxu_probe", "kind": "matmul", "m": m, "k": k, "n": n,
        "ms": round(sec * 1e3, 3),
        "tflops": _tflops(2.0 * m * k * n, sec),
    }
    print(json.dumps(row), flush=True)


def probe_conv(cin: int, cout: int, kk: int, dil: int, iters: int = 8) -> None:
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(ka, (B, N, H, W, cin), dtype=jnp.bfloat16)
    w = jax.random.normal(kb, (1, kk, kk, cin, cout), dtype=jnp.bfloat16)
    pad = dil * (kk // 2)

    def cv(xx, ww):
        return conv3d(xx, ww, padding=(0, pad, pad), dilation=(1, dil, dil))

    sec = device_loop_time(cv, x, w, iters=iters)
    flops = 2.0 * B * N * H * W * cout * cin * kk * kk
    row = {
        "step": "mxu_probe", "kind": "conv",
        "conv": f"{cin}->{cout} ({kk}x{kk}) dil{dil} @ b{B}",
        "ms": round(sec * 1e3, 2),
        "tflops": _tflops(flops, sec),
    }
    print(json.dumps(row), flush=True)


def probe_stream(gb: float = 1.0, iters: int = 30) -> None:
    n = int(gb * 2**29)  # bf16 elements
    x = jnp.zeros((n,), dtype=jnp.bfloat16)

    def add(xx):
        return xx + jnp.bfloat16(1)

    sec = device_loop_time(add, x, iters=iters)
    row = {
        "step": "mxu_probe", "kind": "hbm_stream",
        "gb_moved": round(2 * n * 2 / 2**30, 2),
        "gbps": round(2 * n * 2 / sec / 2**30, 1),
    }
    print(json.dumps(row), flush=True)


def probe_kernel_vs_conv() -> None:
    """The existing fused FM Pallas kernel vs the XLA conv at the b128
    headline scale, both channel-first-free of staging costs: the kernel gets
    an already-(BN, C, H, W) input, the conv its native NDHWC — so this
    isolates kernel-vs-lowering, with the layout question left to a
    whole-graph A/B if the kernel wins."""
    import numpy as np

    from dffx.ops.pallas_kernels import bn_fused_affine, fm_conv_bn_relu_cf

    ka, kb = jax.random.split(jax.random.PRNGKey(2))
    bn = B * N
    x_cf = jax.random.normal(ka, (bn, 3, H, W), dtype=jnp.bfloat16)
    w = jax.random.normal(kb, (1, 9, 9, 3, 8), dtype=jnp.bfloat16)
    scale = jnp.asarray(np.full((8,), 0.9, np.float32))
    shift = jnp.asarray(np.full((8,), 0.1, np.float32))

    def kern(xx, ww):
        return fm_conv_bn_relu_cf(xx, ww, scale, shift)

    sec = device_loop_time(kern, x_cf, w, iters=8)
    flops = 2.0 * bn * H * W * 8 * 3 * 81
    print(json.dumps({
        "step": "mxu_probe", "kind": "fm_kernel_cf_b128",
        "ms": round(sec * 1e3, 2), "tflops": _tflops(flops, sec),
    }), flush=True)


def main_vmem() -> None:
    """VMEM-resident matmuls: small-M operands loop in on-chip memory, so the
    rate is MXU-fill-limited, not HBM-limited — the true ceiling for the dots
    inside any fused conv kernel.  Shapes: fm ky-shift (27,72), srd ky-shift
    (24,24), dres (3,3,3) ky-shift (72,48) and im2col (216,16), calibration
    (128,128)/(512,512)."""
    enable_persistent_cache()
    M = 1 << 16  # 64K rows: a=3.4MB, out<=16MB — VMEM-scale working set
    for k, n in ((128, 128), (512, 512), (27, 72), (24, 24), (72, 48),
                 (216, 16), (243, 8)):
        probe_matmul(M, k, n, iters=400)


def main() -> None:
    enable_persistent_cache()
    M = 1 << 22  # 4.2M rows ~ 1/45 of the full-res pixel count, >> any tile
    # calibration: dense fill + bandwidth
    probe_matmul(M, 128, 128)
    probe_stream()
    # fm conv formulations
    probe_matmul(M, 27, 72)     # ky-shift
    probe_matmul(M, 27, 128)    # ky-shift, N padded to a full tile
    probe_matmul(M, 243, 8)     # classic im2col
    # srd rb2d conv formulations
    probe_matmul(M, 24, 24)     # ky-shift
    probe_matmul(M, 72, 8)      # classic im2col
    # the real ops, measured at the headline shape
    probe_conv(3, 8, 9, 2)
    probe_conv(8, 8, 3, 1)


if __name__ == "__main__":
    import sys

    if "--vmem" in sys.argv[1:]:
        main_vmem()
    elif "--kernel" in sys.argv[1:]:
        enable_persistent_cache()
        probe_kernel_vs_conv()
    else:
        main()
