"""Multi-host (DCN) data parallelism: a real 2-process CPU cluster must
produce the same training losses as single-process on the same global batch
(SURVEY.md §2.5 "collective comm backend" row — DCN via the JAX multi-host
runtime; the reference has no multi-node story at all)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _oracle_losses():
    """Same steps, single process, one device (sync-BN is mesh-invariant —
    proven by test_train_step_mesh_independent)."""
    from distributed_worker import B_GLOBAL, SyntheticDS

    from dffx.models import init_params, network_specs
    from dffx.train import LossConfig, create_train_state, make_train_step

    ds = SyntheticDS()
    step = make_train_step(lr=1e-3, loss_cfg=LossConfig(), donate=False)
    state = create_train_state(init_params(network_specs(), seed=0), lr=1e-3)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    losses = []
    for start in range(0, len(ds), B_GLOBAL):
        samples = [ds[i] for i in range(start, start + B_GLOBAL)]
        batch = {
            k: jax.device_put(np.stack([s[k] for s in samples]), dev)
            for k in samples[0]
        }
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
    return losses


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env_base.update(
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        DFFX_COORDINATOR=f"127.0.0.1:{port}",
        DFFX_NUM_PROCESSES="2",
        JAX_DEFAULT_MATMUL_PRECISION="highest",
    )
    procs = []
    for pid in range(2):
        env = dict(env_base, DFFX_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")]
        assert line, out[-4000:]
        losses.append(json.loads(line[0][len("LOSSES "):]))
    # the two controllers run the same SPMD program — identical losses
    np.testing.assert_array_equal(losses[0], losses[1])
    assert "primary=True" in outs[0] and "primary=False" in outs[1]

    want = _oracle_losses()
    # 4-device vs 1-device reduction orderings differ in fp32 — measured
    # ~4e-5 relative after one step
    np.testing.assert_allclose(losses[0], want, rtol=5e-4)
