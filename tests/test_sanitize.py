"""Sanitizer subsystem: in-graph non-finite detection fused into the train
step, lazy leaf-naming diagnosis, and the differential loader race detector.
The reference has no equivalent (SURVEY §5: no sanitizers/race detection)."""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dffx.models import init_params, network_specs
from dffx.train import LossConfig, create_train_state, make_train_step
from dffx.utils.sanitize import (
    NonFiniteError,
    check_loader_determinism,
    finite_report,
    nonfinite_count,
    raise_nonfinite,
    thread_guard,
)


def _batch(rng, poison=False):
    b, n, h, w = 2, 5, 32, 32
    fs = rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)
    if poison:
        fs[0, 2, 5, 7, 1] = np.nan
    return {
        "fs": jnp.asarray(fs),
        "depth": jnp.asarray(rng.uniform(0.1, 1.5, (b, h, w)).astype(np.float32)),
        "focus_dists": jnp.asarray(
            np.tile(np.linspace(0.1, 1.5, n, dtype=np.float32), (b, 1))
        ),
        "mask": jnp.asarray(np.ones((b, h, w), bool)),
    }


def test_nonfinite_count_exact_and_jittable():
    tree = {
        "a": jnp.array([1.0, np.nan, np.inf, -np.inf]),
        "b": jnp.ones((3, 3)),
        "ints": jnp.arange(5),  # non-float leaves are skipped
    }
    assert int(nonfinite_count(tree)) == 3
    assert int(jax.jit(nonfinite_count)(tree)) == 3


def test_finite_report_names_offending_leaves():
    tree = {"ok": np.zeros(4), "bad": {"w": np.array([np.nan, 1.0, np.inf])}}
    rep = finite_report(tree)
    assert len(rep) == 1
    (name, (n, size)), = rep.items()
    assert "bad" in name and "w" in name and (n, size) == (2, 3)


def test_raise_nonfinite_message_is_actionable():
    with pytest.raises(NonFiniteError) as ei:
        raise_nonfinite("boom", {"grads": {"layer.w": np.array([np.inf])}})
    msg = str(ei.value)
    assert "boom" in msg and "layer.w" in msg and "1/1 non-finite" in msg


def test_sanitized_step_flags_poisoned_batch():
    """A NaN in one input pixel must surface as a non-zero in-graph gradient
    count on the very step it enters — fail-fast instead of training on."""
    params = init_params(network_specs(), seed=0)
    step = make_train_step(1e-4, LossConfig(), donate=False, sanitize=True)
    state = create_train_state(params, lr=1e-4)
    rng = np.random.default_rng(0)

    _, logs = step(state, _batch(rng))
    assert int(logs["nonfinite_grads"]) == 0
    assert "grads" in logs  # diagnosis tree rides along on device

    _, logs = step(state, _batch(rng, poison=True))
    assert int(logs["nonfinite_grads"]) > 0
    rep = finite_report(logs["grads"])
    assert rep, "diagnosis must name at least one gradient leaf"


def test_sanitize_off_keeps_logs_lean():
    params = init_params(network_specs(), seed=0)
    step = make_train_step(1e-4, LossConfig(), donate=False)
    _, logs = step(create_train_state(params, lr=1e-4), _batch(np.random.default_rng(0)))
    assert "nonfinite_grads" not in logs and "grads" not in logs


# --------------------------------------------------------------------------
# concurrency
# --------------------------------------------------------------------------


class _ToyDataset:
    def __init__(self, n=13, delay_odd=False):
        self.n = n
        self.delay_odd = delay_odd

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay_odd and i % 2:
            time.sleep(0.005)  # skew decode completion order across threads
        return {"x": np.full((3,), i, np.int64)}


def test_loader_determinism_clean():
    from dffx.data.pipeline import Loader

    n = check_loader_determinism(
        lambda threads: Loader(
            _ToyDataset(delay_odd=True), 2, shuffle=True, seed=7,
            num_threads=threads,
        )
    )
    assert n == 7  # 13 samples, batch 2, no drop_last


def test_loader_determinism_catches_order_race():
    """A loader that yields in decode-completion order (the classic race) must
    be caught by the threaded-vs-serial comparison."""

    class RacyLoader:
        def __init__(self, threads):
            self.threads = threads

        def __iter__(self):
            ds = _ToyDataset(delay_odd=True)
            idxs = list(range(len(ds)))
            if self.threads == 1:
                for i in idxs:
                    yield {"x": ds[i]["x"]}
                return
            out, lock = [], threading.Lock()

            def work(i):
                s = ds[i]
                with lock:
                    out.append(s)

            ts = [threading.Thread(target=work, args=(i,)) for i in idxs]
            [t.start() for t in ts]
            [t.join() for t in ts]
            yield from ({"x": s["x"]} for s in out)  # completion order!

    with pytest.raises(AssertionError, match="race|divergence"):
        check_loader_determinism(RacyLoader)


def test_thread_guard_passes_on_clean_pipeline():
    from dffx.data.pipeline import Loader, device_prefetch

    with thread_guard():
        for _ in device_prefetch(iter(Loader(_ToyDataset(), 2, num_threads=2))):
            pass


def test_thread_guard_catches_leak():
    stop = threading.Event()
    with pytest.raises(RuntimeError, match="leaked threads.*pinned-worker"):
        with thread_guard(grace_seconds=0.1):
            threading.Thread(
                target=stop.wait, name="pinned-worker", daemon=True
            ).start()
    stop.set()
