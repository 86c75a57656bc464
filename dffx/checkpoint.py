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
# Native persistence (train/resume).
#
# Format v2: a single .ckpt file that is an npz archive — each tree leaf as
# one array member, the tree layout as a JSON manifest member.  Versioned,
# dependency-free (no pickled optax/jax class internals, so checkpoints
# survive library upgrades), atomic (tmp + rename), and async-writable.
# Round-1 checkpoints were pickled pytrees; ``load`` still reads those
# (migration path) — loading one and saving again upgrades it.
# ---------------------------------------------------------------------------

FORMAT_VERSION = 2
_MANIFEST = "__dffx_manifest__"

import itertools as _itertools

_tmp_counter = _itertools.count()


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = [jax.tree_util.keystr(p) for p, _ in leaves]
    assert len(set(keys)) == len(keys), "duplicate tree paths"
    return keys, [v for _, v in leaves]


def _write(path: str, keys, arrays) -> None:
    import io
    import json
    import zipfile

    manifest = json.dumps({"version": FORMAT_VERSION, "keys": keys})
    # unique per call, not just per process: two in-flight save_async()s to
    # the same path must not interleave writes into one tmp file
    tmp = f"{path}.tmp.{os.getpid()}.{next(_tmp_counter)}"
    try:
        with open(tmp, "wb") as f:
            # ZIP_STORED: tensors don't deflate, and mmap-style reads stay cheap
            with zipfile.ZipFile(f, "w", zipfile.ZIP_STORED) as zf:
                zf.writestr(_MANIFEST, manifest)
                for i, arr in enumerate(arrays):
                    buf = io.BytesIO()
                    # allow_pickle=False: an object-dtype leaf must fail fast
                    # at save time — read_array defaults allow_pickle=False,
                    # so an embedded pickle would only explode at load.
                    # asarray(order="C"), NOT ascontiguousarray: the latter
                    # silently promotes 0-d leaves (TrainState.step) to (1,),
                    # breaking shape fidelity across a resume.
                    np.lib.format.write_array(
                        buf, np.asarray(arr, order="C"), allow_pickle=False
                    )
                    zf.writestr(f"leaf_{i}.npy", buf.getvalue())
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save(path: str, tree) -> None:
    """Write a checkpoint atomically (format v2)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    keys, leaves = _flatten(tree)
    _write(path, keys, [np.asarray(v) for v in leaves])


class AsyncSave:
    """Handle for an in-flight background checkpoint write."""

    def __init__(self, thread):
        self._thread = thread
        self.error = None

    def wait(self) -> None:
        self._thread.join()
        if self.error is not None:
            raise self.error


def save_async(path: str, tree) -> AsyncSave:
    """Snapshot the tree to host memory, then write in a background thread —
    the train loop keeps stepping while the previous epoch's checkpoint lands.
    Call ``.wait()`` (or start the next save) before relying on the file."""
    import threading

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    keys, leaves = _flatten(tree)
    arrays = [np.asarray(v) for v in leaves]  # device->host snapshot, blocking

    def run():
        try:
            _write(path, keys, arrays)
        except BaseException as e:  # surfaced by wait()
            handle.error = e

    t = threading.Thread(target=run, daemon=True)
    handle = AsyncSave(t)
    t.start()
    return handle


def _regroup(by_key):
    """Rebuild nested dicts from keystr paths for template-less loads.

    Dict segments (``['name']``) become real nesting, so ``blob["step"]`` /
    ``blob["params"][<torch key>]`` work like the v1 pickles did; any
    non-dict remainder (optax namedtuple attribute paths) stays a flat
    string key inside its deepest dict — pass ``template`` to restore those
    into real optax state objects.
    """
    import re

    seg = re.compile(r"\['((?:[^'\\]|\\.)*)'\]")
    out: Dict[str, object] = {}
    for key, arr in by_key.items():
        parts, pos = [], 0
        while (m := seg.match(key, pos)) is not None:
            parts.append(m.group(1))
            pos = m.end()
        rest = key[pos:]
        if rest:
            dirs, leaf = parts, rest
        else:
            dirs, leaf = parts[:-1], parts[-1]
        node = out
        for d in dirs:
            node = node.setdefault(d, {})
        node[leaf] = arr
    return out


def load(path: str, template=None):
    """Load a checkpoint.

    Format v2 files need ``template`` — any pytree with the same structure
    (e.g. a freshly created ``TrainState``) whose leaves are replaced by the
    stored arrays.  Without a template, returns ``{keystr: array}``.
    Legacy (round-1 pickle) files load as the original pytree regardless.
    """
    import json
    import zipfile

    with open(path, "rb") as f:
        magic = f.read(2)
    if magic != b"PK":  # legacy pickle checkpoint (format v1)
        with open(path, "rb") as f:
            return pickle.load(f)

    with zipfile.ZipFile(path) as zf:
        manifest = json.loads(zf.read(_MANIFEST).decode())
        if manifest["version"] > FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {path!r} has format v{manifest['version']} > "
                f"supported v{FORMAT_VERSION}"
            )
        import io

        arrays = [
            np.lib.format.read_array(io.BytesIO(zf.read(f"leaf_{i}.npy")))
            for i in range(len(manifest["keys"]))
        ]
    by_key = dict(zip(manifest["keys"], arrays))
    if template is None:
        return _regroup(by_key)
    tkeys, _ = _flatten(template)
    missing = sorted(set(tkeys) - set(by_key))
    extra = sorted(set(by_key) - set(tkeys))
    if missing or extra:
        raise ValueError(
            f"checkpoint/template mismatch: missing={missing[:3]} extra={extra[:3]} "
            f"({len(missing)} missing, {len(extra)} extra)"
        )
    leaves_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    return jax.tree_util.tree_unflatten(
        treedef, [by_key[jax.tree_util.keystr(p)] for p, _ in leaves_path]
    )
