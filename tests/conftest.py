"""Test harness: force CPU with 8 virtual devices so mesh/sharding tests run
without TPU hardware (the fake-backend story the reference lacks, SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os

# Override unconditionally: the session environment may point JAX at a TPU
# ('axon', registered by a sitecustomize that imports jax before any user
# code), so env vars alone are too late — use jax.config as well.  Tests must
# be deterministic fp32 CPU with a virtual 8-chip mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Determinism + fp32 matmuls for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
