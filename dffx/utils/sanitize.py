"""Numerics and concurrency sanitizers.

The reference has no sanitizer of any kind (SURVEY §5: no race detection, no
anomaly detection; the only concurrency note is an OpenCV-deadlock comment,
`test_Dataloader.py:102`).  This module is the TPU-native equivalent of what
``torch.autograd.detect_anomaly`` + a thread sanitizer would give a torch
user, designed around XLA's execution model:

* **Non-finite detection runs in-graph**, as one scalar reduction fused into
  the already-compiled train step (``make_train_step(sanitize=True)`` →
  ``logs["nonfinite_grads"]``).  The alternative — ``jax.config
  jax_debug_nans`` — recompiles every op un-donated and checks after each
  dispatch, which serializes the pipelined step and breaks buffer donation;
  a fused count costs one VPU pass over the gradient tree and may be left
  on for entire runs — measured free at the b128 record point (`tools/
  bench_train.py --sanitize-ab`, ONCHIP_r05.jsonl: 701.9 vs 707.6 ms/step,
  inside run-to-run noise; identical 22.14 TFLOP, +0.15% bytes accessed).
* **Diagnosis is lazy**: only a *triggered* failure pays for the per-leaf
  host walk that names which tensors went bad (`finite_report`).
* **Race detection is differential**: the threaded ``Loader`` must be
  bitwise equal to its own single-threaded execution and to a re-run of
  itself (`check_loader_determinism`) — an ordering or shared-state race in
  the decode pool shows up as a mismatch without any instrumentation in the
  hot path.  ``thread_guard`` catches leaked worker threads across an
  epoch (the failure mode the r2 ``device_prefetch`` early-exit bug had).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# numerics
# --------------------------------------------------------------------------


def nonfinite_count(tree: Any) -> jax.Array:
    """Total number of non-finite elements over all floating leaves — a single
    int32 scalar, traceable inside jit (the in-graph sanitizer probe)."""
    total = jnp.zeros((), jnp.int32)
    for leaf in jax.tree_util.tree_leaves(tree):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            total = total + jnp.sum(~jnp.isfinite(leaf)).astype(jnp.int32)
    return total


def finite_report(tree: Any) -> Dict[str, Tuple[int, int]]:
    """Host-side diagnosis: ``{leaf_path: (n_nonfinite, size)}`` for every
    floating leaf that contains a NaN/Inf.  Walks the tree on host (one
    fetch per offending leaf) — only called after a trigger, never per step."""
    bad: Dict[str, Tuple[int, int]] = {}
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n = int(np.sum(~np.isfinite(arr)))
        if n:
            bad[jax.tree_util.keystr(path)] = (n, arr.size)
    return bad


class NonFiniteError(RuntimeError):
    """Raised by the train-loop sanitizer; carries the per-leaf report."""

    def __init__(self, message: str, report: Dict[str, Dict[str, Tuple[int, int]]]):
        self.report = report
        lines = [message]
        for group, leaves in report.items():
            for name, (n, size) in sorted(leaves.items(), key=lambda kv: -kv[1][0]):
                lines.append(f"  {group}{name}: {n}/{size} non-finite")
        if len(lines) == 1:
            lines.append(
                "  (no non-finite leaf found in the inspected trees — the bad "
                "value was transient, e.g. an inf loss from a zero mask "
                "denominator; inspect the batch source)"
            )
        super().__init__("\n".join(lines))


def raise_nonfinite(message: str, trees: Dict[str, Any]) -> None:
    """Diagnose the named trees and raise :class:`NonFiniteError`.

    ``trees`` maps a group label (``"grads"``, ``"batch"``, ``"params"``) to a
    pytree; the error message lists every offending leaf, worst first, so the
    failure names the tensor — not just "loss is NaN at step k"."""
    report = {g: r for g, t in trees.items() if (r := finite_report(t))}
    raise NonFiniteError(message, report)


# --------------------------------------------------------------------------
# concurrency
# --------------------------------------------------------------------------


@contextlib.contextmanager
def thread_guard(grace_seconds: float = 2.0):
    """Assert no threads leak across the guarded block.

    Snapshot ``threading.enumerate()`` on entry; on clean exit, any *new*
    thread still alive after ``grace_seconds`` (daemon or not — a pinned
    daemon producer is still a leak, it holds its closure's buffers) raises
    ``RuntimeError`` naming the threads."""
    before = set(threading.enumerate())
    yield
    leaked = [t for t in threading.enumerate() if t not in before and t.is_alive()]
    deadline = grace_seconds
    for t in leaked:
        t.join(timeout=max(deadline, 0.01))
    leaked = [t for t in leaked if t.is_alive()]
    if leaked:
        raise RuntimeError(
            "leaked threads after guarded block: "
            + ", ".join(repr(t.name) for t in leaked)
        )


def _batches_equal(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray]) -> bool:
    return set(a) == set(b) and all(np.array_equal(a[k], b[k]) for k in a)


def check_loader_determinism(
    loader_factory: Callable[[int], Any],
    *,
    n_batches: Optional[int] = None,
) -> int:
    """Differential race detector for threaded loaders.

    ``loader_factory(num_threads)`` must build a fresh, identically-seeded
    loader.  Three executions are compared batch-for-batch bitwise: threaded,
    threaded again (run-to-run determinism — catches unsynchronized shared
    state like a dataset-level cache or RNG), and ``num_threads=1``
    (ordering — catches completion-order yields).  Returns the number of
    batches compared; raises ``AssertionError`` naming the first divergent
    batch and keys."""

    def take(loader):
        out = []
        for i, b in enumerate(loader):
            if n_batches is not None and i >= n_batches:
                break
            out.append(b)
        return out

    threaded_a = take(loader_factory(4))
    threaded_b = take(loader_factory(4))
    serial = take(loader_factory(1))

    for tag, other in (("run-to-run", threaded_b), ("threaded-vs-serial", serial)):
        if len(threaded_a) != len(other):
            raise AssertionError(
                f"loader {tag} batch-count mismatch: {len(threaded_a)} vs {len(other)}"
            )
        for i, (x, y) in enumerate(zip(threaded_a, other)):
            if not _batches_equal(x, y):
                keys = [k for k in x if not np.array_equal(x[k], y.get(k))]
                raise AssertionError(
                    f"loader {tag} divergence at batch {i}, keys {keys} — "
                    "a decode-pool ordering or shared-state race"
                )
    return len(threaded_a)
