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


def install_reference_stubs():
    """Shim the third-party modules the read-only reference imports but this
    image lacks (skimage, OpenEXR, Imath, numpy<2 fromstring), so reference
    code can serve as a parity oracle.  Test-only; dffx itself never needs them."""
    import sys
    import types

    if "skimage" not in sys.modules:
        import scipy.ndimage as ndi

        kv = np.array([[3, 0, -3], [10, 0, -10], [3, 0, -3]], dtype=np.float64) / 32.0
        filters = types.ModuleType("skimage.filters")
        filters.scharr_v = lambda img: ndi.correlate(
            np.asarray(img, dtype=np.float64), kv, mode="reflect"
        )
        filters.scharr_h = lambda img: ndi.correlate(
            np.asarray(img, dtype=np.float64), kv.T, mode="reflect"
        )
        skimage = types.ModuleType("skimage")
        skimage.filters = filters
        skimage.color = types.ModuleType("skimage.color")
        skimage.exposure = types.ModuleType("skimage.exposure")
        sys.modules["skimage"] = skimage
        sys.modules["skimage.filters"] = filters
        sys.modules["skimage.color"] = skimage.color
        sys.modules["skimage.exposure"] = skimage.exposure

    if "OpenEXR" in sys.modules:
        return

    from dffx.data import exr

    class _Pt:
        def __init__(self, x, y):
            self.x, self.y = x, y

    class _Box:
        def __init__(self, w, h):
            self.min, self.max = _Pt(0, 0), _Pt(w - 1, h - 1)

    class InputFile:
        def __init__(self, path):
            self._ch = exr.read(path)

        def header(self):
            h, w = next(iter(self._ch.values())).shape
            return {"dataWindow": _Box(w, h)}

        def channels(self, names):
            return [self._ch[n].astype(np.float16).tobytes() for n in names]

    mod = types.ModuleType("OpenEXR")
    mod.InputFile = InputFile
    sys.modules["OpenEXR"] = mod
    sys.modules["Imath"] = types.ModuleType("Imath")
    if not hasattr(np, "fromstring"):
        np.fromstring = lambda s, dtype=float: np.frombuffer(s, dtype=dtype)
