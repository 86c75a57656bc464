"""Checkpoint interop: reference PyTorch ``check_point.pth`` ⇄ dffx param dicts,
plus native orbax-style persistence for dffx training.

Because dffx parameter keys equal the torch state_dict keys, conversion is a
pure per-tensor layout transpose driven by the spec table:

* Conv3d weight  ``(Cout, Cin, kd, kh, kw)`` → ``(kd, kh, kw, Cin, Cout)``
* ConvTranspose3d weight ``(Cin, Cout, kd, kh, kw)`` → ``(kd, kh, kw, Cin, Cout)``
* BN / bias vectors pass through.

Handles both reference save flavours: ``model.module.state_dict()`` (plain
keys) and the HCI recipe's full-DataParallel dict with ``module.``-prefixed
keys (`train_codes/train_code_HCI.py:64` vs `train_code_DDFF.py:79`).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from dffx.models.layers import SpecTable

_CONV_KINDS = {"conv_msra", "conv_default"}


def from_torch_state_dict(state_dict: Mapping[str, "object"], specs: SpecTable) -> Dict[str, jax.Array]:
    """Convert a torch state_dict (tensors or ndarrays) to a dffx param dict."""
    items = {}
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        items[key] = arr

    missing = sorted(set(specs) - set(items))
    extra = sorted(set(items) - set(specs))
    if missing or extra:
        raise ValueError(
            f"state_dict/spec mismatch: missing={missing[:5]}... extra={extra[:5]}... "
            f"({len(missing)} missing, {len(extra)} extra)"
        )

    out: Dict[str, jax.Array] = {}
    for key, spec in specs.items():
        kind, shape = spec[0], spec[1]
        arr = items[key]
        if kind in _CONV_KINDS:
            arr = arr.transpose(2, 3, 4, 1, 0)  # (O,I,d,h,w) -> (d,h,w,I,O)
        elif kind == "deconv":
            arr = arr.transpose(2, 3, 4, 0, 1)  # (I,O,d,h,w) -> (d,h,w,I,O)
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{key}: converted shape {arr.shape} != spec {shape}")
        if kind == "bn_count":
            out[key] = jnp.asarray(arr, dtype=jnp.int64)
        else:
            out[key] = jnp.asarray(arr, dtype=jnp.float32)
    return out


def load_torch_checkpoint(path: str, specs: SpecTable) -> Dict[str, jax.Array]:
    """Load a reference ``check_point.pth`` / ``<epoch>.pth`` file."""
    import torch  # host-side only; never on the TPU compute path

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_torch_state_dict(sd, specs)


def to_torch_state_dict(params: Mapping[str, jax.Array], specs: SpecTable) -> Dict[str, np.ndarray]:
    """Inverse conversion, for exporting dffx-trained weights to the reference."""
    out: Dict[str, np.ndarray] = {}
    for key, spec in specs.items():
        kind = spec[0]
        arr = np.asarray(params[key])
        if kind in _CONV_KINDS:
            arr = arr.transpose(4, 3, 0, 1, 2)
        elif kind == "deconv":
            arr = arr.transpose(3, 4, 0, 1, 2)
        elif kind == "bn_count":
            # torch state_dicts carry num_batches_tracked as int64; on-device
            # these live as int32 (jax x64 disabled), so restore the dtype here
            arr = arr.astype(np.int64)
        out[key] = arr
    return out


# ---------------------------------------------------------------------------
# Native persistence (train/resume).  A flat dict of ndarrays: msgpack-free,
# mmap-friendly, multi-host safe when written by process 0 only.
# ---------------------------------------------------------------------------


def save(path: str, tree) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = jax.tree_util.tree_map(np.asarray, tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(flat, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
