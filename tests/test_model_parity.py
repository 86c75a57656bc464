"""Full-model numerics parity vs the reference PyTorch implementation.

The reference repo (read-only at /root/reference) is imported as a *test
oracle*: we random-init its torch model, convert the state_dict with
``dffx.checkpoint`` and require matching outputs.  This is the checkpoint-parity
gate of SURVEY.md §4 without needing the stripped ``check_point.pth`` blobs.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dffx import checkpoint
from dffx.models import (
    Ctx,
    dffnet_apply,
    e2e_apply,
    e2e_network_specs,
    network_specs,
)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _load_ref_module(subdir, name):
    import importlib

    path = os.path.join(REF, subdir)
    if path not in sys.path:
        sys.path.insert(0, path)
    mod = importlib.import_module(name)
    return mod


@pytest.fixture(scope="module")
def ref_depth_net():
    torch.manual_seed(0)
    mod = _load_ref_module("Depth_Estimation_Test", "Depth_Estimation_Network")
    model = mod.Network().eval()
    return model


def test_state_dict_keys_roundtrip(ref_depth_net):
    specs = network_specs()
    sd = ref_depth_net.state_dict()
    params = checkpoint.from_torch_state_dict(sd, specs)
    assert set(params) == set(sd)
    back = checkpoint.to_torch_state_dict(params, specs)
    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v.numpy())


@pytest.mark.parametrize("n,h,w", [(5, 64, 96), (10, 64, 64)])
def test_dffnet_forward_parity(ref_depth_net, rng, n, h, w):
    specs = network_specs()
    params = checkpoint.from_torch_state_dict(ref_depth_net.state_dict(), specs)

    fs = rng.uniform(-1, 1, size=(1, 3, n, h, w)).astype(np.float32)
    fd = np.linspace(0.1, 1.5, n).astype(np.float32)

    with torch.no_grad():
        fd_t = torch.from_numpy(np.tile(fd[None, :, None, None], (1, 1, h, w)))
        ref_outs = ref_depth_net(torch.from_numpy(fs), fd_t)

    fs_j = jnp.asarray(fs.transpose(0, 2, 3, 4, 1))  # (B,3,N,H,W)->(B,N,H,W,3)
    outs = dffnet_apply(params, fs_j, jnp.asarray(fd[None]), Ctx(precision="highest"))

    for got, ref, name in zip(outs, ref_outs, ["mid", "pred1", "pred2", "pred3"]):
        ref = ref.numpy().squeeze(0)
        got = np.asarray(got).squeeze(0)
        assert got.shape == ref.shape, name
        np.testing.assert_allclose(got, ref, atol=2e-4, err_msg=name)


@pytest.fixture(scope="module")
def ref_e2e_net():
    torch.manual_seed(1)
    mod = _load_ref_module("End_to_End", "End_to_End")
    model = mod.Network().eval()
    return model


def test_e2e_forward_parity(ref_e2e_net, rng):
    specs = e2e_network_specs()
    params = checkpoint.from_torch_state_dict(ref_e2e_net.state_dict(), specs)

    n, h, w = 10, 64, 96
    fs = rng.uniform(-1, 1, size=(1, 3, n, h, w)).astype(np.float32)
    fd = (1.0 / np.linspace(0.2, 3.0, n)).astype(np.float32)
    fovs = np.linspace(1.0, 1.02, n).astype(np.float32)

    with torch.no_grad():
        fd_t = torch.from_numpy(fd[None, :, None, None])  # loader shape (B,10,1,1)
        fovs_t = torch.from_numpy(fovs[None, None, :, None, None])  # (B,1,N,1,1)
        ref_outs = ref_e2e_net(torch.from_numpy(fs), fd_t, fovs_t)

    fs_j = jnp.asarray(fs.transpose(0, 2, 3, 4, 1))
    outs = e2e_apply(
        params, fs_j, jnp.asarray(fd[None]), jnp.asarray(fovs[None]), Ctx(precision="highest")
    )

    # warped focal stack
    ref_warp = ref_outs[4].numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(outs[4]), ref_warp, atol=2e-4)
    for got, ref, name in zip(outs[:4], ref_outs[:4], ["mid", "pred1", "pred2", "pred3"]):
        np.testing.assert_allclose(
            np.asarray(got).squeeze(0), ref.numpy().squeeze(0), atol=5e-4, err_msg=name
        )
