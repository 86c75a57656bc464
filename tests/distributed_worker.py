"""One process of the 2-process CPU cluster exercised by ``test_distributed``.

Launched by the test with JAX_PLATFORMS=cpu, a 2-virtual-device XLA flag, and
the DFFX_COORDINATOR / DFFX_NUM_PROCESSES / DFFX_PROCESS_ID env vars.  Runs
one epoch of batch-sharded training over the global (2-host x 2-device) mesh
with the host-sharded Loader, printing per-step losses for the test to compare
against its single-process oracle.
"""

import json
import sys

import numpy as np

B_GLOBAL = 4
N_SAMPLES = 8
N, H, W = 2, 32, 32


class SyntheticDS:
    """Deterministic per-index samples — identical in every process."""

    def __len__(self):
        return N_SAMPLES

    def __getitem__(self, idx):
        rng = np.random.default_rng(1000 + idx)
        return {
            "fs": rng.uniform(-1, 1, (N, H, W, 3)).astype(np.float32),
            "depth": rng.uniform(0.1, 1.5, (H, W)).astype(np.float32),
            "focus_dists": np.linspace(0.1, 1.5, N).astype(np.float32),
            "mask": np.ones((H, W), bool),
        }


def main():
    from dffx.parallel import batch_sharding, distributed, make_mesh, replicate

    distributed.initialize()  # from DFFX_* env vars

    import jax

    from dffx.data import Loader, device_prefetch
    from dffx.models import init_params, network_specs
    from dffx.train import LossConfig, create_train_state, make_train_step

    mesh = make_mesh()
    assert mesh.devices.size == 4, mesh  # 2 processes x 2 virtual devices

    loader = Loader(
        SyntheticDS(), B_GLOBAL, shuffle=False, num_threads=1,
        process_id=jax.process_index(), process_count=jax.process_count(),
    )
    step = make_train_step(lr=1e-3, loss_cfg=LossConfig(), donate=False)
    state = create_train_state(init_params(network_specs(), seed=0), lr=1e-3)
    state = jax.device_put(state, replicate(mesh))

    losses = []
    for batch in device_prefetch(iter(loader), sharding=batch_sharding(mesh)):
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
    print("LOSSES " + json.dumps(losses), flush=True)
    print(f"DONE pid={jax.process_index()} primary={distributed.is_primary()}",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
