"""Multi-host (multi-slice) data parallelism over DCN.

The reference has no multi-node story at all (SURVEY.md §2.5: no
``torch.distributed``, no NCCL/MPI — only single-process ``nn.DataParallel``,
`Depth_Estimation_Test/test.py:32`).  The TPU-native equivalent is the
standard JAX multi-controller runtime: every host runs the same program,
``jax.distributed.initialize`` wires the processes into one cluster, the mesh
spans every device of every host, and gradient all-reduces ride ICI within a
slice and DCN across slices — all compiled from sharding annotations.

Usage (one process per host):

    from dffx.parallel import distributed
    distributed.initialize(coordinator="host0:1234", num_processes=4,
                           process_id=this_host)
    mesh = make_mesh()                      # now spans all hosts' devices
    batch = distributed.global_batch(local_batch, batch_sharding(mesh))

Each host feeds only its local shard of the global batch
(``Loader(..., process_id=..., process_count=...)``) and
``global_batch`` assembles the logically-global ``jax.Array`` from the
process-local data — no cross-host data transfer on the input path.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

_ENV_COORD = "DFFX_COORDINATOR"
_ENV_NPROC = "DFFX_NUM_PROCESSES"
_ENV_PID = "DFFX_PROCESS_ID"


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host cluster (no-op for single-process runs).

    Arguments fall back to ``DFFX_COORDINATOR`` / ``DFFX_NUM_PROCESSES`` /
    ``DFFX_PROCESS_ID`` env vars, and those to JAX's own autodetection
    (TPU pod metadata), so single-host invocations need no flags at all.
    Must run before any other JAX call.
    """
    coordinator = coordinator or os.environ.get(_ENV_COORD)
    if num_processes is None and _ENV_NPROC in os.environ:
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and _ENV_PID in os.environ:
        process_id = int(os.environ[_ENV_PID])
    if coordinator is None and num_processes is None:
        return  # single-process
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # CPU multi-process clusters need the gloo collectives backend or the
        # processes never aggregate into one device set (verified on jax 0.9)
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # config renamed/absent — fall through to jax defaults
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs/prints."""
    return jax.process_index() == 0


def global_batch(local: Dict[str, np.ndarray], sharding: jax.sharding.Sharding):
    """Assemble per-host local batches into one global sharded ``jax.Array``.

    ``local``'s leading axis is this host's slice of the global batch (the
    hosts' slices concatenate in process order).  Single-process: a plain
    ``device_put`` with the sharding.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local,
    )
