"""DDFF-12 checkpoint-parity gate (BASELINE.json config #2).

Two modes, so the gate NEVER skips (VERDICT r3 item 4):

- **External blob** (``DFFX_DDFF_CKPT``): the original gate against the
  published pretrained ``check_point.pth`` (stripped from this mirror,
  `/root/reference/.MISSING_LARGE_BLOBS`), optionally on the real test h5
  (``DFFX_DDFF_H5``).

- **Locally trained** (default): train the reference *train-side* network
  (`train_codes/Depth_Estimation_Network.py`) a few genuine Adam steps on
  CPU — real gradient updates, real BatchNorm running stats, non-trivial
  ``num_batches_tracked`` — then ``torch.save`` BOTH reference flavors:
  plain ``model.module.state_dict()`` (`train_codes/train_code_DDFF.py:79`)
  and the HCI recipe's full-DataParallel ``module.``-prefixed dict
  (`train_codes/train_code_HCI.py:64`), and run the same convert → forward
  parity gate on the round-tripped files.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")  # the oracle; skip, don't error, without it

import jax.numpy as jnp

from dffx import checkpoint
from dffx.models import Ctx, dffnet_apply, network_specs

CKPT = os.environ.get("DFFX_DDFF_CKPT")
H5 = os.environ.get("DFFX_DDFF_H5")
REF_TRAIN_NET = "/root/reference/train_codes/Depth_Estimation_Network.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_TRAIN_NET) and not (CKPT and os.path.exists(CKPT)),
    reason="neither the reference repo nor an external checkpoint is available",
)


def _load_train_side_network():
    """Import the train-side reference copy under a non-colliding module name
    (test_model_parity.py imports the test-side copy as
    ``Depth_Estimation_Network``)."""
    spec = importlib.util.spec_from_file_location(
        "ref_train_depth_network", REF_TRAIN_NET
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def trained_ref(tmp_path_factory):
    """Reference model trained 3 real steps (Adam(0.9,0.99), masked-MSE x4
    with the 0.3/0.5/0.7/1.0 weights — the train_code_*.py template), saved
    in both reference flavors via torch.save."""
    mod = _load_train_side_network()
    torch.manual_seed(0)
    model = mod.Network().train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, betas=(0.9, 0.99))
    rng = np.random.default_rng(0)
    n, h, w = 5, 64, 64
    for _ in range(3):
        fs = torch.from_numpy(rng.uniform(-1, 1, (2, 3, n, h, w)).astype(np.float32))
        fd = torch.from_numpy(
            np.tile(
                np.linspace(0.1, 1.5, n, dtype=np.float32)[None, :, None, None],
                (2, 1, h, w),
            )
        )
        gt = torch.from_numpy(rng.uniform(0.1, 1.5, (2, h, w)).astype(np.float32))
        outs = model(fs, fd)
        loss = sum(
            wgt * torch.mean((o - gt) ** 2)
            for wgt, o in zip([0.3, 0.5, 0.7, 1.0], outs)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()
    tmp = tmp_path_factory.mktemp("refckpt")
    plain = str(tmp / "plain.pth")
    dp = str(tmp / "dataparallel.pth")
    # train_code_DDFF.py:79 — torch.save(model.module.state_dict(), path)
    torch.save(model.state_dict(), plain)
    # train_code_HCI.py:64 — torch.save(model.state_dict(), path) where model
    # IS the nn.DataParallel wrapper: keys arrive `module.`-prefixed
    torch.save(torch.nn.DataParallel(model).state_dict(), dp)
    return model, {"plain": plain, "module_prefixed": dp}


def test_training_actually_updated_bn_state(trained_ref):
    """The fixture must produce a *trained* checkpoint: updated BN running
    stats and num_batches_tracked == 3 — the state the stripped blobs carry
    and random-init parity tests never exercise."""
    model, _ = trained_ref
    sd = model.state_dict()
    nbt = [int(v) for k, v in sd.items() if k.endswith("num_batches_tracked")]
    # the reference keeps dead layers for checkpoint compat (hourglassup's
    # redir3, hourglass's pre_conv) — their counters stay 0; every layer on
    # the forward path must have tracked exactly the 3 train batches
    assert set(nbt) == {0, 3}, sorted(set(nbt))
    assert sum(v == 3 for v in nbt) > 3 * sum(v == 0 for v in nbt)
    means = [v for k, v in sd.items() if k.endswith("running_mean")]
    assert any(float(v.abs().sum()) > 1e-3 for v in means)
    variances = [v for k, v in sd.items() if k.endswith("running_var")]
    # defaults are exactly 1.0; a trained net must have moved them
    assert any(float((v - 1.0).abs().max()) > 1e-3 for v in variances)


@pytest.mark.parametrize("flavor", ["plain", "module_prefixed"])
def test_trained_checkpoint_forward_parity(trained_ref, flavor, rng):
    """torch.save file -> load_torch_checkpoint -> eval forward must match the
    trained torch model for BOTH reference save flavors."""
    model, paths = trained_ref
    specs = network_specs()
    params = checkpoint.load_torch_checkpoint(paths[flavor], specs)

    n, h, w = 5, 64, 64
    fs = rng.uniform(-1, 1, (1, 3, n, h, w)).astype(np.float32)
    fd = np.linspace(0.1, 1.5, n).astype(np.float32)
    with torch.no_grad():
        fd_t = torch.from_numpy(np.tile(fd[None, :, None, None], (1, 1, h, w)))
        ref_outs = model(torch.from_numpy(fs), fd_t)

    fs_j = jnp.asarray(fs.transpose(0, 2, 3, 4, 1))
    outs = dffnet_apply(params, fs_j, jnp.asarray(fd[None]), Ctx(precision="highest"))
    for got, ref, name in zip(outs, ref_outs, ["mid", "pred1", "pred2", "pred3"]):
        np.testing.assert_allclose(
            np.asarray(got).squeeze(0), ref.numpy().squeeze(0), atol=2e-4,
            err_msg=f"{flavor}/{name}",
        )


def test_ddff_checkpoint_loads_and_matches_reference(trained_ref):
    """The <1% relative-MSE gate.  Runs against the external pretrained blob
    when supplied (DFFX_DDFF_CKPT [+ DFFX_DDFF_H5]), else against the locally
    trained checkpoint on a DDFF-shaped input — same converter, same gate."""
    if CKPT and os.path.exists(CKPT):
        ref_dir = "/root/reference/Depth_Estimation_Test"
        sys.path.insert(0, ref_dir)
        from Depth_Estimation_Network import Network

        model = Network().eval()
        model.load_state_dict(
            torch.load(CKPT, map_location="cpu", weights_only=True)
        )
        ckpt_path = CKPT
        n, h, w = 10, 384, 576
    else:
        model, paths = trained_ref
        ckpt_path = paths["plain"]
        n, h, w = 10, 96, 160  # DDFF-aspect, x32; keeps the CPU suite fast

    specs = network_specs()
    params = checkpoint.load_torch_checkpoint(ckpt_path, specs)

    if CKPT and H5 and os.path.exists(H5):
        import h5py

        with h5py.File(H5, "r") as f:
            fs_raw = np.asarray(f["stack_test"][0], dtype=np.float32)
        fs = fs_raw / 127.5 - 1.0
        ph, pw = (32 - fs.shape[1] % 32) % 32, (32 - fs.shape[2] % 32) % 32
        fs = np.pad(fs, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-1.0)
    else:
        fs = np.random.default_rng(0).uniform(-1, 1, (n, h, w, 3)).astype(np.float32)

    from dffx.data.datasets import ddff_focus_dists

    fd = ddff_focus_dists()[:n]
    with torch.no_grad():
        hh, ww = fs.shape[1:3]
        fd_t = torch.from_numpy(np.tile(fd[None, :, None, None], (1, 1, hh, ww)))
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
