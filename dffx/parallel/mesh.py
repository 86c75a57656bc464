"""Mesh + sharding helpers.

Axis conventions for the whole framework:

* arrays are ``(B, N, H, W, C)``;
* ``data`` shards axis 0 (the batch);
* ``spatial`` shards axis 2 (H) — batch-1 full-res inference scales across
  chips this way, with GSPMD-inserted halo exchanges sized to each stage's
  receptive field (17 px for the dilated FM stage, 1-2 px for 3x3 stages).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    data: Optional[int] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a ``(data, spatial)`` mesh over the given devices.

    Defaults to all devices on the ``data`` axis (pure DP) — the right shape
    for the reference's training recipes, where batch is the only scaling axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % spatial == 0, (n, spatial)
        data = n // spatial
    assert data * spatial == n, (data, spatial, n)
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard ``(B, N, H, W, C)`` arrays: batch over ``data``, H over ``spatial``."""
    return NamedSharding(mesh, P(DATA_AXIS, None, SPATIAL_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
