"""Simulator parity vs the reference `Simulator/synthetic_blur_movement.py`
(imported with a neutralized CLI so only its pure functions load)."""

import os
import sys

import numpy as np
import pytest

from dffx.sim import (
    DEVICE_PROFILES,
    coc_layers,
    disc_kernel,
    generate_scene,
    render_focal_slice,
    warp_2d,
)

REF_SIM = "/root/reference/Simulator"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_SIM), reason="no reference")


@pytest.fixture(scope="module")
def ref_sim(monkeypatch=None):
    import types
    import importlib

    # the reference parses argv and runs generation at import; pick a dataset
    # name whose branch doesn't exist so only the function defs execute
    sys.modules.setdefault("mat73", types.ModuleType("mat73"))
    argv = sys.argv
    sys.argv = ["synthetic_blur_movement.py", "--dataset", "___none___"]
    try:
        ns = {}
        path = os.path.join(REF_SIM, "synthetic_blur_movement.py")
        with open(path) as f:
            src = f.read()
        try:
            exec(compile(src, path, "exec"), ns)
        except NameError:
            # the module's trailing timing print references `start`, which only
            # exists inside the (skipped) dataset branch — functions are all
            # defined by then
            pass
    finally:
        sys.argv = argv
    return types.SimpleNamespace(**ns)


def test_warp_parity_rgb(ref_sim, rng):
    img = rng.uniform(0, 255, (40, 56, 3)).astype(np.float32)
    import torch

    for fov, beta, gamma in [(1.02, 3.0, -2.0), (0.97, -1.5, 0.8), (1.0, 0.0, 0.0)]:
        got = warp_2d(img, fov, beta, gamma)
        want = ref_sim.FOV_warp(
            img.copy(), fov, torch.tensor(float(beta)), torch.tensor(float(gamma))
        )
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_warp_parity_depth(ref_sim, rng):
    import torch

    d = rng.uniform(0.1, 1.1, (40, 56)).astype(np.float32)
    got = warp_2d(d, 1.03, 2.0, 1.0)
    want = ref_sim.DepthFOV_warp(d.copy(), 1.03, torch.tensor(2.0), torch.tensor(1.0))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("size", [1, 3, 5, 9, 15])
def test_disc_kernel_parity(ref_sim, size):
    np.testing.assert_allclose(disc_kernel(size), ref_sim.create_blur(size), rtol=1e-12)


def test_coc_layers_cover_and_merge():
    layers = coc_layers(
        coc_scale=35.0, focus_dist=0.4, min_scene_depth=0.1, max_scene_depth=1.1,
        num_planes=500,
    )
    # runs are contiguous, cover the scene depth range, CoC monotone increasing
    assert layers[0][1] == pytest.approx(0.1)
    assert layers[-1][2] >= 1.1  # last run reaches max depth (+0.1 when the
    # reference's float-equality extension fires)
    for (c0, a0, b0), (c1, a1, b1) in zip(layers, layers[1:]):
        assert b0 == pytest.approx(a1)
        assert c1 > c0  # CoC grows with depth past focus


def test_render_focal_slice_matches_cv2_reference_algorithm(rng):
    """Our one-conv layered blur vs a direct transcription of the reference's
    per-layer cv2.filter2D + binary composite."""
    import cv2

    image = rng.uniform(0, 255, (32, 48, 3)).astype(np.float32)
    depth = rng.uniform(0.1, 1.1, (32, 48))
    layers = [(0, 0.1, 0.4), (2, 0.4, 0.7), (-3, 0.7, 0.9), (5, 0.9, 1.2)]

    got = render_focal_slice(image, depth, layers)

    # reference algorithm (synthetic_blur_movement.py:250-270), minus the
    # BGR->RGB flip which generate_scene applies separately
    blurred_imgs, depth_set = [], []
    for coc_size, min_dis, max_dis in layers:
        sub_depth = ((depth >= min_dis) & (depth < max_dis)).astype(np.uint8)
        sub_img = image.astype(np.uint8)
        depth_set.append(sub_depth)
        k = 1 if coc_size == 0 else coc_size
        kernel = disc_kernel(2 * abs(k) + 1)
        blurred_imgs.append(cv2.filter2D(sub_img, -1, kernel))
    want = blurred_imgs[-1] * depth_set[-1][..., None]
    for i in range(len(layers) - 1):
        want += blurred_imgs[len(layers) - 2 - i] * depth_set[len(layers) - 2 - i][..., None]

    # uint8 rounding of the conv may differ by 1 at exact .5 ties
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 1).mean() > 0.999, diff.max()
    assert np.median(diff) == 0


def test_scene_fused_matches_per_slice(rng):
    """The vmapped whole-scene program must be numerically identical to the
    per-slice programs it batches (padding rows contribute nothing)."""
    from dffx.sim import render_scene_fused, render_slice_fused

    image = rng.uniform(0, 255, (24, 40, 3)).astype(np.float32)
    depth = rng.uniform(0.1, 1.1, (24, 40))
    depth_px = depth * 1e4
    slice_params = [
        dict(fov=1.0, beta=0.0, gamma=0.0, coc_scale=30.0, fd_px=0.4e4,
             layers=[(0, 0.1, 0.5), (3, 0.5, 1.2)]),
        dict(fov=1.02, beta=1.5, gamma=-0.7, coc_scale=45.0, fd_px=0.7e4,
             layers=[(-2, 0.1, 0.4), (1, 0.4, 0.8), (6, 0.8, 1.2)]),
        dict(fov=0.98, beta=-2.0, gamma=0.3, coc_scale=20.0, fd_px=0.9e4,
             layers=[(-7, 0.1, 0.6), (2, 0.6, 1.2)]),
    ]
    imgs, disp = render_scene_fused(image, depth, depth_px, slice_params)
    for j, p in enumerate(slice_params):
        want_img, want_disp = render_slice_fused(
            image, depth, depth_px, p["fov"], p["beta"], p["gamma"],
            p["layers"], p["coc_scale"], p["fd_px"],
        )
        np.testing.assert_array_equal(imgs[j], want_img, err_msg=f"slice {j}")
        # disparity: the vmapped warp batches the interpolation matmuls, so
        # fp32 accumulation order differs from the single-slice program —
        # values are O(1e2) px, tolerance is relative
        np.testing.assert_allclose(disp[j], want_disp, rtol=1e-4, atol=1e-3,
                                   err_msg=f"slice {j}")


def test_generate_scene_end_to_end(rng):
    image = rng.uniform(0, 255, (28, 44, 3)).astype(np.float32)
    depth = rng.uniform(0.1, 1.1, (28, 44))
    out = generate_scene(
        image,
        depth,
        profile=DEVICE_PROFILES[1],
        rng=np.random.default_rng(0),
        pixel_vs_meter=1 / 0.0000014 * 44 / 4080,
        num_imgs=4,
        num_planes=100,
    )
    assert len(out["imgs"]) == 4
    assert all(im.shape == (28, 44, 3) and im.dtype == np.uint8 for im in out["imgs"])
    assert out["disparity"].shape == (28, 44, 4)
    assert np.isfinite(out["disparity"]).all()
    assert out["depth"].shape == (28, 44)
    # slice 0 is unwarped: its disparity must follow the thin-lens formula
    assert out["camera_setting"]["focal_length"] > 0
