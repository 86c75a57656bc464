"""Per-op device-time profile of a jitted program via a jax.profiler trace.

The prefix/component marginals (`tools/profile_train.py`) localize cost to a
*stage*; this tool splits a stage's time across the actual compiled ops (conv
dgrad/wgrad, fusions, copies) by parsing the trace's XPlane protobuf — the
missing level of detail when deciding whether a backward is MXU-fill-bound or
bandwidth-bound.

    python tools/profile_trace.py --what train   # fwd+bwd+Adam step (b32 bf16 224^2)
    python tools/profile_trace.py --what fwd     # eval forward

Prints device-plane op rows sorted by total self-time, grouped into buckets
(conv fwd / conv bwd-filter / conv bwd-input / fusion / copy / other) with a
bucket summary. One process at a time on the TPU (house rule).
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import tempfile
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp


def capture(step, args_, logdir):
    out = step(*args_)  # warm/compile outside the trace window
    jax.block_until_ready(out)
    with jax.profiler.trace(logdir):
        out = step(*args_)
        jax.block_until_ready(out)
    # readback forces the tail of the program into the window
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)


def _xplane_pb2():
    """Load the XPlane proto gencode without importing all of tensorflow
    (the pb2 file only needs google.protobuf)."""
    import importlib.util

    for cand in glob.glob(
        "/opt/venv/lib/python*/site-packages/tensorflow/tsl/profiler/protobuf/xplane_pb2.py"
    ):
        spec = importlib.util.spec_from_file_location("xplane_pb2", cand)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # heavy fallback

    return xplane_pb2


def load_xplanes(logdir):
    xplane_pb2 = _xplane_pb2()

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_times(xs):
    """{op_name: total_ns} from the busiest device plane's line events."""
    best, best_total = None, 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        total = sum(ev.duration_ps for line in plane.lines for ev in line.events)
        if total > best_total:
            best, best_total = plane, total
    if best is None:
        raise SystemExit("no device plane in trace")
    times = defaultdict(int)
    # XLA op lines carry the per-op events; pick lines named like "XLA Ops"
    lines = [l for l in best.lines if "op" in l.name.lower()] or list(best.lines)
    for line in lines:
        for ev in line.events:
            name = best.event_metadata[ev.metadata_id].name
            times[name] += ev.duration_ps
    return {k: v / 1e3 for k, v in times.items()}  # ns


def bucket(name):
    n = name.lower()
    if "convolution" in n or n.startswith("%conv") or "conv" in n:
        # backward-filter convs contract over the batch dim; XLA names them
        # with "filter" / gradients carry characteristic fusion names.  Fall
        # back to plain substring buckets — names are checked in the report.
        if "filter" in n or "wgrad" in n:
            return "conv.wgrad"
        if "input" in n or "dgrad" in n or "transpose" in n:
            return "conv.dgrad-ish"
        return "conv"
    if "fusion" in n:
        return "fusion"
    if "copy" in n:
        return "copy"
    if "reduce" in n:
        return "reduce"
    if any(k in n for k in ("dynamic", "slice", "concat", "pad", "reverse")):
        return "data-movement"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["train", "fwd"], default="train")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=[224, 224])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    from dffx.models import Ctx, init_params, network_specs, trainable_mask, dffnet_apply
    from dffx.train import LossConfig
    from dffx.train.loop import total_loss
    from dffx.utils.profiling import enable_persistent_cache

    enable_persistent_cache()
    b, n = args.batch, 10
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

    if args.what == "fwd":
        @jax.jit
        def step(x, p, d):
            return dffnet_apply(p, x.astype(dt), d, Ctx(train=False, compute_dtype=dt))

        call_args = (fs, params, fd)
    else:
        def loss_fn(t, x, s, d):
            new_stats = {}
            ctx = Ctx(train=True, new_stats=new_stats, compute_dtype=dt)
            outs = dffnet_apply({**t, **s}, x.astype(dt), d, ctx)
            outs = tuple(o.astype(jnp.float32) for o in outs[:4])
            tot, logs = total_loss(outs, {"depth": depth, "mask": maskpx}, cfg)
            return tot, (new_stats, logs)

        @jax.jit
        def step(x, t, s, d):
            (_, (ns, logs)), g = jax.value_and_grad(loss_fn, has_aux=True)(t, x, s, d)
            return g, ns, logs["loss"]

        call_args = (fs, trainables, stats, fd)

    logdir = args.logdir or tempfile.mkdtemp(prefix="dffx_trace_")
    capture(step, call_args, logdir)
    xs = load_xplanes(logdir)
    times = device_op_times(xs)

    total = sum(times.values())
    print(f"device total {total/1e6:9.3f} ms over {len(times)} ops  (trace: {logdir})")
    buckets = defaultdict(float)
    for k, v in times.items():
        buckets[bucket(k)] += v
    print("\nby bucket:")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v/1e6:9.3f} ms  {100*v/total:5.1f}%")
    print(f"\ntop {args.top} ops:")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {v/1e6:9.3f} ms  {k}")


if __name__ == "__main__":
    main()
