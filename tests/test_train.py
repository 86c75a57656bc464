"""Training-step correctness: loss math vs the reference recipes, remat
equivalence, end-to-end (alignment) training, checkpoint save/load roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dffx import checkpoint as ckpt
from dffx.models import e2e_network_specs, init_params, network_specs
from dffx.train import LossConfig, create_train_state, make_train_step, masked_mse
from dffx.train.recipes import RECIPES


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b, n, h, w = 2, 5, 32, 32
    return {
        "fs": jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.1, 1.5, (b, h, w)).astype(np.float32)),
        "focus_dists": jnp.asarray(
            np.tile(np.linspace(0.1, 1.5, n, dtype=np.float32), (b, 1))
        ),
        "mask": jnp.asarray(rng.random((b, h, w)) > 0.2),
        "conf": jnp.asarray(rng.random((b, h, w)).astype(np.float32)),
    }


def test_masked_mse_matches_torch_semantics(rng):
    import torch

    est = rng.standard_normal((2, 16, 16)).astype(np.float32)
    gt = rng.standard_normal((2, 16, 16)).astype(np.float32)
    mask = rng.random((2, 16, 16)) > 0.4
    got = float(masked_mse(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask)))
    want = torch.nn.MSELoss()(
        torch.from_numpy(est)[torch.from_numpy(mask)],
        torch.from_numpy(gt)[torch.from_numpy(mask)],
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_recipes_cover_all_five_references():
    # the five reference recipes, plus dffx's end-to-end extension
    assert set(RECIPES) == {
        "DDFF", "HCI", "Defocus", "FlyingThings", "Smartphone", "Simulated"
    }
    assert RECIPES["Simulated"].e2e
    hci = RECIPES["HCI"]
    assert hci.loss.norm_range == (-2.5, 2.5) and not hci.loss.normalize_mid
    assert RECIPES["FlyingThings"].loss.norm_range == (10.0, 100.0)
    assert RECIPES["FlyingThings"].max_epoch == 2500
    assert RECIPES["Smartphone"].loss.conf_weighted
    assert RECIPES["DDFF"].loss.weights == (0.3, 0.5, 0.7, 1.0)


def test_remat_step_matches_plain(batch):
    params = init_params(network_specs(), seed=0)
    s0 = create_train_state(params, lr=1e-3)
    plain = make_train_step(1e-3, LossConfig(), donate=False)
    sa, logs_a = plain(s0, batch)
    # remat only rewires the BACKWARD (what gets stored vs recomputed), so the
    # real assertion is gradient equality — checked through the updated
    # weights of params whose grad paths cross checkpoint boundaries
    grad_probes = [
        "DFF_net.FM_measure.Focus_extraction.0.0.weight",
        "DFF_net.FM_conv1.0.stride_conv.0.weight",
        "DFF_net.dres4.conv1.0.0.weight",
    ]
    step = make_train_step(1e-3, LossConfig(), donate=False, remat=True)
    sb, logs_b = step(create_train_state(init_params(network_specs(), seed=0),
                                         lr=1e-3), batch)
    np.testing.assert_allclose(float(logs_a["loss"]), float(logs_b["loss"]),
                               rtol=1e-6)
    for k in grad_probes:
        np.testing.assert_allclose(
            np.asarray(sb.params[k]), np.asarray(sa.params[k]),
            atol=1e-6, err_msg=k
        )
    # BN new-stats routed out of the checkpoints must land identical
    k = "DFF_net.FM_measure.Focus_extraction.0.1.running_mean"
    np.testing.assert_allclose(np.asarray(sb.params[k]), np.asarray(sa.params[k]),
                               rtol=1e-6, err_msg=k)


def test_e2e_remat_step_matches_plain():
    """Selective stage remat through flownet (pyramid + warp-head checkpoints)
    must be numerically identical to the plain e2e step."""
    rng = np.random.default_rng(2)
    b, n, h, w = 1, 10, 32, 32
    e2e_batch = {
        "fs": jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.1, 1.5, (b, h, w)).astype(np.float32)),
        "focus_dists": jnp.asarray(
            np.tile(np.linspace(0.1, 1.5, n, dtype=np.float32), (b, 1))
        ),
        "mask": jnp.ones((b, h, w), bool),
        "fovs": jnp.asarray(np.tile(np.linspace(1.0, 1.02, n, dtype=np.float32), (b, 1))),
    }
    plain = make_train_step(1e-3, LossConfig(), e2e=True, donate=False)
    sa, logs_a = plain(create_train_state(init_params(e2e_network_specs(), seed=0),
                                          lr=1e-3), e2e_batch)
    # conv3/OF_feature probe grad paths that cross the pyramid/warp-head
    # checkpoint boundaries
    keys = ["optical_flow_aggregation.conv1.6.weight",
            "optical_flow_aggregation.conv3.0.0.weight",
            "optical_flow_aggregation.OF_feature.0.conv.0.0.weight"]
    remat = make_train_step(1e-3, LossConfig(), e2e=True, donate=False, remat=True)
    sb, logs_b = remat(create_train_state(init_params(e2e_network_specs(), seed=0),
                                          lr=1e-3), e2e_batch)
    np.testing.assert_allclose(float(logs_a["loss"]), float(logs_b["loss"]),
                               rtol=1e-6)
    for key in keys:
        # checkpoint recomputation reassociates fp32 through the warp /
        # motion-volume chain (observed: 1 element in ~2.6k off by ~4e-5).
        # A dropped gradient path would move many elements by ~the full Adam
        # update (~lr = 1e-3), so atol=1e-4 still detects broken backwards
        # while tolerating rounding.
        np.testing.assert_allclose(np.asarray(sb.params[key]),
                                   np.asarray(sa.params[key]), atol=1e-4,
                                   err_msg=key)


def test_e2e_train_step_runs_and_updates_alignment():
    params = init_params(e2e_network_specs(), seed=0)
    state = create_train_state(params, lr=1e-3)
    rng = np.random.default_rng(1)
    b, n, h, w = 1, 10, 32, 32  # N must be 10: the motion heads pool to 10 vectors
    e2e_batch = {
        "fs": jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.1, 1.5, (b, h, w)).astype(np.float32)),
        "focus_dists": jnp.asarray(
            np.tile(np.linspace(0.1, 1.5, n, dtype=np.float32), (b, 1))
        ),
        "mask": jnp.ones((b, h, w), bool),
        "fovs": jnp.asarray(np.tile(np.linspace(1.0, 1.02, n, dtype=np.float32), (b, 1))),
    }
    step = make_train_step(1e-3, LossConfig(), e2e=True, donate=False)
    new_state, logs = step(state, e2e_batch)
    assert np.isfinite(float(logs["loss"]))
    key = "optical_flow_aggregation.conv1.6.weight"
    moved = np.abs(
        np.asarray(new_state.params[key]) - np.asarray(state.params[key])
    ).max()
    assert moved > 0, "alignment head did not receive gradient through the warp"


def test_checkpoint_v2_template_roundtrip(tmp_path, batch):
    """Format-v2 resume: leaves restore into real optax state objects via a
    fresh-state template, and one more step runs from the restored state."""
    params = init_params(network_specs(), seed=0)
    state = create_train_state(params, lr=1e-3)
    step = make_train_step(1e-3, LossConfig(), donate=False)
    state, _ = step(state, batch)
    path = str(tmp_path / "models" / "1.ckpt")
    ckpt.save(path, {"step": state.step, "params": state.params,
                     "opt_state": state.opt_state})
    with open(path, "rb") as f:
        assert f.read(2) == b"PK", "v2 checkpoints are zip archives, not pickles"

    fresh = create_train_state(init_params(network_specs(), seed=1), lr=1e-3)
    blob = ckpt.load(path, template={"step": fresh.step, "params": fresh.params,
                                     "opt_state": fresh.opt_state})
    restored = type(state)(
        step=jnp.asarray(blob["step"]),
        params={k: jnp.asarray(v) for k, v in blob["params"].items()},
        opt_state=jax.tree_util.tree_map(jnp.asarray, blob["opt_state"]),
    )
    # restored optimizer state is structurally identical (namedtuples back)
    for got, want in zip(jax.tree_util.tree_leaves(restored.opt_state),
                         jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    s2a, _ = step(state, batch)
    s2b, _ = step(restored, batch)
    key = "DFF_net.classif3.0.weight"
    np.testing.assert_allclose(np.asarray(s2b.params[key]),
                               np.asarray(s2a.params[key]), atol=1e-7)


def test_checkpoint_v1_pickle_migration(tmp_path, batch):
    """Round-1 pickle checkpoints must still load (migration path)."""
    import pickle

    params = init_params(network_specs(), seed=0)
    state = create_train_state(params, lr=1e-3)
    path = str(tmp_path / "legacy.ckpt")
    flat = jax.tree_util.tree_map(np.asarray, {
        "step": state.step, "params": state.params, "opt_state": state.opt_state})
    with open(path, "wb") as f:
        pickle.dump(flat, f, protocol=pickle.HIGHEST_PROTOCOL)
    blob = ckpt.load(path)
    assert int(blob["step"]) == 0
    key = "DFF_net.classif3.0.weight"
    np.testing.assert_array_equal(blob["params"][key], np.asarray(state.params[key]))


def test_checkpoint_crash_safety(tmp_path):
    """A crash mid-save (garbage tmp file) must not corrupt the previous
    checkpoint, and the next save must land atomically over it."""
    import os

    path = str(tmp_path / "m" / "1.ckpt")
    ckpt.save(path, {"step": np.int32(1), "w": np.arange(4.0)})
    # simulate a writer that died mid-stream
    with open(path + ".tmp.12345", "wb") as f:
        f.write(b"garbage")
    blob = ckpt.load(path)
    assert int(blob["step"]) == 1
    ckpt.save(path, {"step": np.int32(2), "w": np.arange(4.0) * 2})
    assert int(ckpt.load(path)["step"]) == 2
    # interrupted-save artifacts are never picked up as checkpoints
    assert os.path.exists(path + ".tmp.12345")


def test_checkpoint_async_save(tmp_path):
    handle = ckpt.save_async(str(tmp_path / "a.ckpt"),
                             {"step": np.int32(3), "w": np.ones((8, 8))})
    handle.wait()
    blob = ckpt.load(str(tmp_path / "a.ckpt"))
    assert int(blob["step"]) == 3
    np.testing.assert_array_equal(blob["w"], np.ones((8, 8)))


def test_checkpoint_roundtrip(tmp_path, batch):
    params = init_params(network_specs(), seed=0)
    state = create_train_state(params, lr=1e-3)
    step = make_train_step(1e-3, LossConfig(), donate=False)
    state, _ = step(state, batch)
    path = str(tmp_path / "models" / "1.ckpt")
    ckpt.save(path, {"step": state.step, "params": state.params, "opt_state": state.opt_state})
    blob = ckpt.load(path)
    assert int(blob["step"]) == 1
    # 0-d leaves must round-trip as 0-d (ascontiguousarray silently promoted
    # them to (1,) until round 3) — resume must hand back the exact shapes
    assert np.asarray(blob["step"]).shape == ()
    for k, v in state.params.items():
        np.testing.assert_array_equal(blob["params"][k], np.asarray(v))
