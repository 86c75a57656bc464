"""dffx.metrics vs the reference metrics module (imported read-only as oracle)."""

import os
import sys

import numpy as np
import pytest

from dffx import metrics as M

REF = "/root/reference/Depth_Estimation_Test"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


@pytest.fixture(scope="module")
def ref_metrics():
    # skimage is not installed in this image; provide the two Scharr filters the
    # reference imports, backed by scipy (independent boundary handling from
    # dffx.metrics' manual reflect-pad, so the comparison stays meaningful).
    import types

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
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.filters", filters)

    sys.path.insert(0, REF)
    import metrics as ref

    return ref


@pytest.fixture
def sample(rng):
    gt = rng.uniform(0.2, 2.0, (64, 64))
    est = gt + rng.normal(0, 0.1, (64, 64))
    est = np.clip(est, 0.05, None)
    mask = rng.random((64, 64)) > 0.3
    conf = rng.random((64, 64))
    return est, gt, mask, conf


@pytest.mark.parametrize(
    "name",
    ["mask_abs_rel", "mask_sq_rel", "mask_mse", "mask_mae", "mask_rmse", "mask_rmse_log"],
)
def test_masked_metrics(ref_metrics, sample, name):
    est, gt, mask, _ = sample
    got = getattr(M, name)(est, gt, mask)
    want = getattr(ref_metrics, name)(est.copy(), gt.copy(), mask)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_accuracy_k(ref_metrics, sample, k):
    est, gt, mask, _ = sample
    np.testing.assert_allclose(
        M.mask_accuracy_k(est, gt, k, mask),
        ref_metrics.mask_accuracy_k(est, gt, k, mask),
        rtol=1e-12,
    )


def test_conf_weighted(ref_metrics, sample):
    est, gt, mask, conf = sample
    np.testing.assert_allclose(
        M.mask_mse_w_conf(est, gt, conf, mask),
        ref_metrics.mask_mse_w_conf(est, gt, conf, mask),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        M.mask_mae_w_conf(est, gt, conf, mask),
        ref_metrics.mask_mae_w_conf(est, gt, conf, mask),
        rtol=1e-12,
    )


def test_bumpiness(ref_metrics, sample):
    est, gt, mask, _ = sample
    np.testing.assert_allclose(
        M.get_bumpiness(gt, est, mask),
        ref_metrics.get_bumpiness(gt, est, mask),
        rtol=1e-9,
    )
