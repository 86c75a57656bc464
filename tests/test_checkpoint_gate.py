"""DDFF-12 checkpoint-parity gate (BASELINE.json config #2).

The pretrained ``check_point.pth`` blobs are stripped from this mirror
(`/root/reference/.MISSING_LARGE_BLOBS`); when they and the DDFF test h5 are
supplied externally, this gate runs the full converted-checkpoint inference and
asserts dffx matches the reference PyTorch model's predictions within 1% MSE.

    DFFX_DDFF_CKPT=/path/check_point.pth \
    DFFX_DDFF_H5=/path/ddff-dataset-test.h5 python -m pytest tests/test_checkpoint_gate.py
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

CKPT = os.environ.get("DFFX_DDFF_CKPT")
H5 = os.environ.get("DFFX_DDFF_H5")

pytestmark = pytest.mark.skipif(
    not (CKPT and os.path.exists(CKPT)),
    reason="pretrained check_point.pth not supplied (set DFFX_DDFF_CKPT)",
)


def test_ddff_checkpoint_loads_and_matches_reference():
    import torch

    from dffx import checkpoint
    from dffx.models import Ctx, dffnet_apply, network_specs

    specs = network_specs()
    params = checkpoint.load_torch_checkpoint(CKPT, specs)

    ref_dir = "/root/reference/Depth_Estimation_Test"
    sys.path.insert(0, ref_dir)
    from Depth_Estimation_Network import Network

    model = Network().eval()
    model.load_state_dict(torch.load(CKPT, map_location="cpu", weights_only=True))

    if H5 and os.path.exists(H5):
        import h5py

        with h5py.File(H5, "r") as f:
            fs_raw = np.asarray(f["stack_test"][0], dtype=np.float32)
        fs = fs_raw / 127.5 - 1.0
        ph, pw = (32 - fs.shape[1] % 32) % 32, (32 - fs.shape[2] % 32) % 32
        fs = np.pad(fs, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-1.0)
    else:
        fs = np.random.default_rng(0).uniform(-1, 1, (10, 384, 576, 3)).astype(np.float32)

    from dffx.data.datasets import ddff_focus_dists

    fd = ddff_focus_dists()
    with torch.no_grad():
        h, w = fs.shape[1:3]
        fd_t = torch.from_numpy(np.tile(fd[None, :, None, None], (1, 1, h, w)))
        ref = model(
            torch.from_numpy(fs.transpose(3, 0, 1, 2)[None]), fd_t
        )[3].numpy().squeeze(0)

    got = np.asarray(
        dffnet_apply(params, jnp.asarray(fs[None]), jnp.asarray(fd[None]),
                     Ctx(precision="highest"))[3]
    )[0]
    mse = float(np.mean((got - ref) ** 2))
    rel = mse / max(float(np.mean(ref**2)), 1e-12)
    assert rel < 0.01, f"relative MSE {rel} exceeds the 1% parity gate"
