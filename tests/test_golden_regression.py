"""Golden-value regression: fixed seed + fixed input → stored outputs.

Guards future optimization rounds (Pallas kernels, layout changes, fusion work)
against silent numerics drift.  Regenerate deliberately with:

    DFFX_REGEN_GOLDENS=1 python -m pytest tests/test_golden_regression.py
"""

import os

import numpy as np

import jax.numpy as jnp

from dffx.models import Ctx, dffnet_apply, e2e_apply, e2e_network_specs, init_params, network_specs

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "forward_v1.npz")


def _compute():
    rng = np.random.default_rng(42)
    fs = jnp.asarray(rng.uniform(-1, 1, (1, 10, 64, 96, 3)).astype(np.float32))
    fd = jnp.asarray((1 / np.linspace(0.2, 3.0, 10, dtype=np.float32))[None])
    fovs = jnp.asarray(np.linspace(1.0, 1.02, 10, dtype=np.float32)[None])

    params = init_params(network_specs(), seed=7)
    outs = dffnet_apply(params, fs, fd, Ctx(precision="highest"))

    e2e_params = init_params(e2e_network_specs(), seed=7)
    e2e_outs = e2e_apply(e2e_params, fs, fd, fovs, Ctx(precision="highest"))
    return {
        "mid": np.asarray(outs[0]),
        "pred3": np.asarray(outs[3]),
        "e2e_pred3": np.asarray(e2e_outs[3]),
        "e2e_warped_sum": np.asarray(jnp.sum(e2e_outs[4], axis=(2, 3))),
    }


def test_forward_matches_goldens():
    got = _compute()
    if os.environ.get("DFFX_REGEN_GOLDENS") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **got)
    ref = np.load(GOLDEN)
    for key in ref.files:
        np.testing.assert_allclose(
            got[key], ref[key], atol=2e-5,
            err_msg=f"{key} drifted from the stored golden — if intentional, "
            "regenerate with DFFX_REGEN_GOLDENS=1",
        )
