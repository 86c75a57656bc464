"""Profiling & throughput instrumentation (SURVEY.md §5: the reference has
only wall-clock prints around forwards — dffx adds real tracing hooks).

* ``trace(logdir)``            — context manager around ``jax.profiler`` traces
  (view in TensorBoard / Perfetto).
* ``StepTimer``                — per-step wall timing with EMA + stacks/sec.
* ``device_loop_time``         — honest device time for a jitted fn: chains K
  executions inside one XLA program via a data dependency, so queue-dispatch
  pipelining and host round-trips can't fake the number (host-side timing of
  async dispatch through the TPU tunnel can be off by 100x).
* ``enable_persistent_cache``  — persistent XLA compilation cache, which turns
  multi-minute cold starts into file loads across processes.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def enable_persistent_cache(path: str = "~/.cache/dffx_xla") -> None:
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/dffx_trace"):
    """jax.profiler trace window: ``with profiling.trace(dir): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing + items/sec, EMA-smoothed."""

    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg: Optional[float] = None
        self._last: Optional[float] = None
        self.total = 0.0
        self.count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._last = dt
        self.total += dt
        self.count += 1
        self._avg = dt if self._avg is None else self._ema * self._avg + (1 - self._ema) * dt

    @property
    def avg(self) -> float:
        return self._avg or 0.0

    def items_per_sec(self, items_per_step: int) -> float:
        return items_per_step / self._avg if self._avg else 0.0


def device_loop_time(fn: Callable, *args, iters: int = 10) -> float:
    """Seconds per call of ``fn(*args)`` measured on-device.

    ``fn``'s first argument must be an array; a vanishing perturbation chains
    the iterations so XLA cannot elide or overlap them, and the scalar readback
    forces completion.
    """

    def many(*a):
        def body(_, acc):
            out = fn((a[0] + acc * 1e-30).astype(a[0].dtype), *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-20

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    m = jax.jit(many)
    float(m(*args))  # compile + warm
    t0 = time.perf_counter()
    float(m(*args))
    return (time.perf_counter() - t0) / iters
