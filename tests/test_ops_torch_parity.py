"""Op-level numerics parity vs PyTorch (the implicit native substrate the
reference runs on — SURVEY.md §2.6). torch (CPU) is used purely as an oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from dffx import ops

ATOL = 2e-5


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil",
    [
        (3, 8, (1, 9, 9), (1, 1, 1), (0, 8, 8), (1, 2, 2)),  # FM_module dilated conv
        (8, 16, (3, 3, 3), (1, 2, 2), (1, 1, 1), (1, 1, 1)),  # EFD strided branch
        (16, 16, (1, 3, 3), (1, 1, 1), (0, 1, 1), (1, 1, 1)),  # resnet_block_2d
        (8, 8, (3, 1, 1), (1, 1, 1), (1, 0, 0), (1, 1, 1)),  # SRD focus attention
        (32, 32, (1, 1, 1), (1, 1, 1), (0, 0, 0), (1, 1, 1)),  # redir 1x1
    ],
)
def test_conv3d(rng, cin, cout, k, stride, pad, dil):
    x = rng.standard_normal((2, 5, 16, 20, cin), dtype=np.float32)
    w = rng.standard_normal((*k, cin, cout), dtype=np.float32) * 0.2
    got = _np(ops.conv3d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=pad, dilation=dil))
    ref = TF.conv3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        torch.from_numpy(w).permute(4, 3, 0, 1, 2),
        stride=stride,
        padding=pad,
        dilation=dil,
    )
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=ATOL)


@pytest.mark.parametrize(
    "cin,cout,n,h,w",
    [(64, 32, 5, 7, 9), (32, 16, 10, 8, 8), (16, 8, 15, 6, 10)],
)
def test_deconv3d_output_padding(rng, cin, cout, n, h, w):
    """The reference's ConvTranspose3d(k3, p1, op=(0,1,1), s=(1,2,2)) everywhere."""
    x = rng.standard_normal((2, n, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((3, 3, 3, cin, cout), dtype=np.float32) * 0.1
    got = _np(
        ops.deconv3d(
            jnp.asarray(x), jnp.asarray(wt), stride=(1, 2, 2), padding=1, output_padding=(0, 1, 1)
        )
    )
    ref = TF.conv_transpose3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        torch.from_numpy(wt).permute(3, 4, 0, 1, 2),
        stride=(1, 2, 2),
        padding=1,
        output_padding=(0, 1, 1),
    )
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    assert got.shape == ref.shape  # (n, 2h, 2w) spatial doubling, N preserved
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_batch_norm_eval(rng):
    x = rng.standard_normal((2, 5, 8, 8, 16), dtype=np.float32)
    mean = rng.standard_normal(16).astype(np.float32)
    var = rng.random(16).astype(np.float32) + 0.5
    g = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    got = _np(ops.batch_norm(jnp.asarray(x), mean, var, g, b))
    bn = torch.nn.BatchNorm3d(16).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
        bn.weight.copy_(torch.from_numpy(g))
        bn.bias.copy_(torch.from_numpy(b))
        ref = bn(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_batch_norm_train_matches_torch_running_stats(rng):
    x = rng.standard_normal((4, 5, 6, 6, 8), dtype=np.float32)
    g = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    rm = rng.standard_normal(8).astype(np.float32)
    rv = rng.random(8).astype(np.float32) + 0.5
    y, new_m, new_v = ops.batch_norm_train(jnp.asarray(x), rm, rv, g, b)
    bn = torch.nn.BatchNorm3d(8).train()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(rm))
        bn.running_var.copy_(torch.from_numpy(rv))
        bn.weight.copy_(torch.from_numpy(g))
        bn.bias.copy_(torch.from_numpy(b))
    ref = bn(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).detach().permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(_np(y), ref, atol=ATOL)
    np.testing.assert_allclose(_np(new_m), bn.running_mean.numpy(), atol=ATOL)
    np.testing.assert_allclose(_np(new_v), bn.running_var.numpy(), atol=ATOL)


@pytest.mark.parametrize("window", [(1, 2, 2), (1, 4, 4), (1, 8, 8)])
def test_avg_pool3d(rng, window):
    x = rng.standard_normal((1, 5, 16, 16, 4), dtype=np.float32)
    got = _np(ops.avg_pool3d(jnp.asarray(x), window))
    ref = (
        TF.avg_pool3d(torch.from_numpy(x).permute(0, 4, 1, 2, 3), window, window)
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_max_pool3d(rng):
    x = rng.standard_normal((2, 5, 12, 14, 6), dtype=np.float32)
    got = _np(ops.max_pool3d(jnp.asarray(x), (1, 2, 2)))
    ref = (
        TF.max_pool3d(torch.from_numpy(x).permute(0, 4, 1, 2, 3), (1, 2, 2), (1, 2, 2))
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, atol=ATOL)


@pytest.mark.parametrize("n_in,n_out", [(10, 10), (15, 10), (5, 10)])
def test_adaptive_avg_pool_focus(rng, n_in, n_out):
    x = rng.standard_normal((2, n_in, 7, 9, 3), dtype=np.float32)
    got = _np(ops.adaptive_avg_pool_focus(jnp.asarray(x), n_out))
    ref = (
        TF.adaptive_avg_pool3d(torch.from_numpy(x).permute(0, 4, 1, 2, 3), (n_out, 1, 1))
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, atol=ATOL)


@pytest.mark.parametrize("hw_in,hw_out", [((8, 9), (64, 72)), ((48, 72), (383, 552)), ((5, 5), (40, 40))])
def test_upsample_bilinear_align_corners_false(rng, hw_in, hw_out):
    x = rng.standard_normal((2, 10, *hw_in), dtype=np.float32)
    got = _np(ops.upsample_bilinear(jnp.asarray(x), hw_out))
    ref = TF.interpolate(torch.from_numpy(x), size=hw_out, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, ref.numpy(), atol=5e-5)  # fp32 accumulation order


def test_softplus_argmax(rng):
    cost = rng.standard_normal((2, 10, 12, 12), dtype=np.float32) * 3
    fd = np.linspace(0.1, 2.0, 10, dtype=np.float32)[None].repeat(2, 0)
    got = _np(ops.softplus_argmax(jnp.asarray(cost), jnp.asarray(fd)))
    p = TF.softplus(torch.from_numpy(cost)) + 1e-6
    p = p / p.sum(dim=1, keepdim=True)
    ref = (torch.from_numpy(fd)[:, :, None, None] * p).sum(dim=1).numpy()
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_grid_sample_2d_matches_torch(rng):
    x = rng.standard_normal((2, 9, 11, 3), dtype=np.float32)
    grid = (rng.random((2, 7, 8, 2), dtype=np.float32) * 2.4) - 1.2  # includes out-of-range
    got = _np(ops.grid_sample_2d(jnp.asarray(x), jnp.asarray(grid)))
    ref = TF.grid_sample(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        align_corners=True,
        padding_mode="zeros",
    )
    np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(), atol=ATOL)


def test_affine_warp_stack_matches_torch_grid_sample(rng):
    """The separable-matmul warp must equal the reference's grid_sample path."""
    b, n, h, w, c = 2, 4, 10, 12, 3
    x = rng.standard_normal((b, n, h, w, c), dtype=np.float32)
    fov = 1.0 + 0.1 * rng.standard_normal((b, n)).astype(np.float32)
    beta = rng.standard_normal((b, n)).astype(np.float32) * 2
    gamma = rng.standard_normal((b, n)).astype(np.float32) * 2
    got, flow = ops.affine_warp_stack(jnp.asarray(x), fov, beta, gamma)
    got = _np(got)

    # Oracle: per-slice torch grid_sample with the reference's grid construction
    # (End_to_End/End_to_End.py:106-134, collapsed to 2D per slice).
    lx = torch.linspace(-1, 1, w)
    ly = torch.linspace(-1, 1, h)
    for bi in range(b):
        for ni in range(n):
            flow_x = (w // 2) * (fov[bi, ni] - 1) * lx[None, :] + beta[bi, ni]  # (1,W)
            flow_y = (h // 2) * (fov[bi, ni] - 1) * ly[:, None] + gamma[bi, ni]  # (H,1)
            gx = (torch.arange(w, dtype=torch.float32)[None, :] - flow_x) * 2 / (w - 1) - 1
            gy = (torch.arange(h, dtype=torch.float32)[:, None] - flow_y) * 2 / (h - 1) - 1
            grid = torch.stack([gx.expand(h, w), gy.expand(h, w)], dim=-1)[None]
            ref = TF.grid_sample(
                torch.from_numpy(x[bi, ni]).permute(2, 0, 1)[None],
                grid,
                align_corners=True,
                padding_mode="zeros",
            )[0].permute(1, 2, 0).numpy()
            np.testing.assert_allclose(got[bi, ni], ref, atol=1e-4)
            np.testing.assert_allclose(
                _np(flow)[bi, ni, :, :, 0], flow_x.expand(h, w).numpy(), atol=1e-5
            )
            np.testing.assert_allclose(
                _np(flow)[bi, ni, :, :, 1], flow_y.expand(h, w).numpy(), atol=1e-5
            )


def test_affine_warp_is_differentiable():
    import jax

    x = jnp.ones((1, 2, 8, 8, 1))

    def loss(p):
        fov, beta, gamma = p
        y, _ = ops.affine_warp_stack(x, fov * jnp.ones((1, 2)), beta * jnp.ones((1, 2)), gamma * jnp.ones((1, 2)))
        return jnp.sum(y**2)

    g = jax.grad(loss)(jnp.asarray([1.05, 0.5, -0.3]))
    assert np.all(np.isfinite(_np(g)))
    assert np.any(_np(g) != 0)
