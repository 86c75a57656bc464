"""AlignNet — coarse-to-fine per-slice global-motion estimation and warping.

Rebuilds the reference ``FlowNetwork`` + end-to-end ``Network``
(`End_to_End/End_to_End.py:8-145`): a shared per-slice 2D feature pyramid, a
three-scale regression of per-slice motion ``(alpha FOV-correction, beta tx,
gamma ty)`` with residual accumulation, and a final warp of the raw stack.

The reference routes the warp through 3D ``grid_sample``; because the z-grid is
identity and the per-slice map is an axis-separable affine, the TPU-native warp
is two per-slice interpolation matmuls (``dffx.ops.affine_warp_stack``) —
exactly equal numerics, MXU-resident, differentiable end-to-end.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dffx.ops import adaptive_avg_pool_focus, affine_warp_stack
from dffx.models.layers import (
    Ctx,
    SpecTable,
    apply_conv,
    apply_convbn,
    bn_spec,
    ckpt_stage,
    conv_spec,
    convbn_spec,
    relu,
)
from dffx.models.dffnet import dffnet_apply, dffnet_specs

ALPHA_DAMPING = 0.001  # `End_to_End.py:79,:88,:99`
N_MOTION = 10  # AdaptiveAvgPool3d((10,1,1)) — motion vectors per stack (`:40`)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _rb_of_specs(s: SpecTable, pfx: str, cin: int, cout: int) -> None:
    """resnet_block_2d_OF (`End_to_End.py:135-145`): projection-shortcut
    residual block.  Lives outside the reference's MSRA init loop, so torch
    default init applies."""
    convbn_spec(s, f"{pfx}.conv.0", cin, cout, (1, 3, 3), kind="conv_default")
    convbn_spec(s, f"{pfx}.conv.2", cout, cout, (1, 3, 3), kind="conv_default")
    conv_spec(s, f"{pfx}.feature", cin, cout, (1, 1, 1), kind="conv_default")


def _fold_conv(p, pfx, x, ctx: Ctx, *, stride: int = 1, pad: int = 0) -> jax.Array:
    """(1, kh, kw) conv with the focus axis folded into the batch — identical
    math to ``conv3d``; XLA's 2D lowering measures 2x faster than the 3D one
    on the full-res feature-pyramid shapes (v5e; the dffnet context and the
    motion heads measure the opposite, so this stays pyramid-local)."""
    from jax import lax

    w = p[f"{pfx}.weight"].astype(x.dtype)
    b, n, h, wd, c = x.shape
    y = lax.conv_general_dilated(
        x.reshape(b * n, h, wd, c), w[0],
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=ctx.precision,
    )
    y = y.reshape(b, n, *y.shape[1:])
    if f"{pfx}.bias" in p:
        y = y + p[f"{pfx}.bias"].astype(y.dtype)
    return y


def _rb_of_apply(p, pfx, x, ctx: Ctx, *, stride: int = 1) -> jax.Array:
    from dffx.models.layers import apply_bn

    y = relu(apply_bn(p, f"{pfx}.conv.0.1",
                      _fold_conv(p, f"{pfx}.conv.0.0", x, ctx, stride=stride, pad=1), ctx))
    y = apply_bn(p, f"{pfx}.conv.2.1",
                 _fold_conv(p, f"{pfx}.conv.2.0", y, ctx, pad=1), ctx)
    short = _fold_conv(p, f"{pfx}.feature", x, ctx, stride=stride)
    return relu(short + y)


def _rb_of_block_params(p, pfx):
    from dffx.ops.pallas_kernels import bn_fused_affine

    def aff(q):
        return bn_fused_affine(p[f"{q}.weight"], p[f"{q}.bias"],
                               p[f"{q}.running_mean"], p[f"{q}.running_var"])

    return (p[f"{pfx}.conv.0.0.weight"], aff(f"{pfx}.conv.0.1"),
            p[f"{pfx}.conv.2.0.weight"], aff(f"{pfx}.conv.2.1"),
            p[f"{pfx}.feature.weight"])


def _rb_of_stack_apply(p, pfxs, x, ctx: Ctx) -> jax.Array:
    """Consecutive STRIDE-1 ``resnet_block_2d_OF`` blocks.

    Eval mode on TPU (``ctx.use_pallas``): the whole stack runs as ONE fused
    Pallas chain (``rb_of_chain``) — the full-res pyramid level (3→8→8 ch at
    the E2E serving shape) was the largest remaining XLA chunk of the
    alignment forward (20.8 ms of ~100, round-4 prefix profile).  Under a
    live spatial mesh the chain runs H-sharded behind one halo exchange
    (receptive radius = 2 convs/block ≤ HALO), with the XLA twin patching
    the true-edge rows.
    """
    from dffx.ops.halo import halo_sharded_chain, spatial_active, spatial_ok

    def xla_chain(xl, pp):
        for pfx in pfxs:
            xl = _rb_of_apply(pp, pfx, xl, ctx)
        return xl

    # no H-divisibility condition: rb_of_chain pads H to its row tile
    # internally (gate-covered at the non-multiple 10x152x272 tail shape);
    # the r4 H%16 gate was an undocumented leftover (ADVICE r4) that kept
    # the quarter-res fe3 tail on XLA at the 608-high serving shape
    if ctx.use_pallas and not ctx.train and x.shape[3] >= 32:
        from dffx.ops.pallas_kernels import rb_of_chain

        def chain(xl, pp):
            return rb_of_chain(xl, tuple(_rb_of_block_params(pp, q) for q in pfxs))

        if spatial_ok(ctx.spatial_mesh, x.shape[2]):
            # declared bleed: 2 convs per block propagate the fake-row error
            return halo_sharded_chain(chain, x, ctx.spatial_mesh, p,
                                      edge_fn=xla_chain, bleed=2 * len(pfxs))
        if not spatial_active(ctx.spatial_mesh):
            # unsharded fused chain ONLY with no live spatial mesh (an
            # unwrapped pallas_call on a sharded stack would all-gather)
            return chain(x, p)
    return xla_chain(x, p)


def _head_specs(s: SpecTable, pfx: str, c: int) -> None:
    """Motion-regression head convN (`End_to_End.py:33-61`): 3x convbn(1,3,3)
    + ReLU, then a biased (1,3,3) conv to 3 channels + adaptive pooling."""
    convbn_spec(s, f"{pfx}.0", c + 2, c, (1, 3, 3), kind="conv_default")
    convbn_spec(s, f"{pfx}.2", c, c, (1, 3, 3), kind="conv_default")
    convbn_spec(s, f"{pfx}.4", c, c, (1, 3, 3), kind="conv_default")
    conv_spec(s, f"{pfx}.6", c, 3, (1, 3, 3), bias=True, kind="conv_default")


def _head_apply(p, pfx, volume, ctx: Ctx) -> jax.Array:
    """Returns per-slice motion ``(B, N_MOTION, 3)`` (alpha, beta, gamma).

    Eval mode on TPU (``ctx.use_pallas``): the full-resolution conv3 head —
    the measured E2E latency tail (ROADMAP item 2) — runs as ONE fused Pallas
    chain (4 convs, intermediates in VMEM) instead of four ~1%-MFU XLA convs.
    The half-res conv2 head (34→32 ch) stays XLA: the fused chain was
    measured on chip in round 4 at ~22.5 ms isolated vs XLA's 12.4 ms
    in-context marginal (c=32 forces 128-wide W chunks and a ~5 min Mosaic
    compile) — see ROUND4.md.  The quarter-res conv1 head (66→64) stays XLA
    too: its in-context marginal is ~3 ms.
    """
    from dffx.ops.halo import halo_sharded_chain, spatial_active, spatial_ok

    if (ctx.use_pallas and not ctx.train and volume.shape[-1] == 18
            and volume.shape[3] >= 32
            and (not spatial_active(ctx.spatial_mesh)
                 or spatial_ok(ctx.spatial_mesh, volume.shape[2]))):
        from dffx.ops.pallas_kernels import bn_fused_affine, motion_head_conv_chain

        def chain(x, pp):
            def aff(i):
                q = f"{pfx}.{i}.1"
                return bn_fused_affine(pp[f"{q}.weight"], pp[f"{q}.bias"],
                                       pp[f"{q}.running_mean"],
                                       pp[f"{q}.running_var"])

            dt = x.dtype
            return motion_head_conv_chain(
                x,
                pp[f"{pfx}.0.0.weight"].astype(dt), aff(0),
                pp[f"{pfx}.2.0.weight"].astype(dt), aff(2),
                pp[f"{pfx}.4.0.weight"].astype(dt), aff(4),
                pp[f"{pfx}.6.weight"].astype(dt), pp[f"{pfx}.6.bias"],
            )

        def xla_chain(xl, pp):
            y = relu(apply_convbn(pp, f"{pfx}.0", xl, ctx, padding=(0, 1, 1)))
            y = relu(apply_convbn(pp, f"{pfx}.2", y, ctx, padding=(0, 1, 1)))
            y = relu(apply_convbn(pp, f"{pfx}.4", y, ctx, padding=(0, 1, 1)))
            return apply_conv(pp, f"{pfx}.6", y, ctx, padding=(0, 1, 1))

        if spatial_ok(ctx.spatial_mesh, volume.shape[2]):
            # row-local 4-conv chain, receptive radius 4 <= HALO: run it
            # H-sharded with one halo exchange; the XLA twin patches the
            # true-edge rows (dffx.ops.halo docstring)
            y = halo_sharded_chain(chain, volume, ctx.spatial_mesh, p,
                                   edge_fn=xla_chain, bleed=3)
        else:
            y = chain(volume, p)
    else:
        y = relu(apply_convbn(p, f"{pfx}.0", volume, ctx, padding=(0, 1, 1)))
        y = relu(apply_convbn(p, f"{pfx}.2", y, ctx, padding=(0, 1, 1)))
        y = relu(apply_convbn(p, f"{pfx}.4", y, ctx, padding=(0, 1, 1)))
        y = apply_conv(p, f"{pfx}.6", y, ctx, padding=(0, 1, 1))  # (B,N,H,W,3)
    pooled = adaptive_avg_pool_focus(y, N_MOTION)  # (B,10,1,1,3)
    return pooled[:, :, 0, 0, :]


def _motion_volume(feat: jax.Array, flow: jax.Array) -> jax.Array:
    """(last-slice features || per-slice features || flow) channel concat
    (`End_to_End.py:71-76`)."""
    last = jnp.broadcast_to(feat[:, -1:], feat.shape)
    return jnp.concatenate([last, feat, flow], axis=-1)


# ---------------------------------------------------------------------------
# FlowNetwork
# ---------------------------------------------------------------------------


def flownet_specs(prefix: str = "optical_flow_aggregation", inplanes: int = 8) -> SpecTable:
    s: SpecTable = {}
    q = lambda n: f"{prefix}.{n}"  # noqa: E731
    _rb_of_specs(s, q("OF_feature.0"), 3, inplanes)
    _rb_of_specs(s, q("OF_feature.1"), inplanes, inplanes)
    _rb_of_specs(s, q("OF_feature1.0"), inplanes, 2 * inplanes)
    _rb_of_specs(s, q("OF_feature1.1"), 2 * inplanes, 2 * inplanes)
    _rb_of_specs(s, q("OF_feature2.0"), 2 * inplanes, 4 * inplanes)
    _rb_of_specs(s, q("OF_feature2.1"), 4 * inplanes, 4 * inplanes)
    _head_specs(s, q("conv1"), 8 * inplanes)
    _head_specs(s, q("conv2"), 4 * inplanes)
    _head_specs(s, q("conv3"), 2 * inplanes)
    return s


def flownet_apply(
    p: Dict[str, jax.Array],
    fs: jax.Array,
    fovs: jax.Array,
    ctx: Optional[Ctx] = None,
    prefix: str = "optical_flow_aggregation",
) -> Tuple[jax.Array, jax.Array]:
    """Align a focal stack (`End_to_End.py:63-104`).

    Args:
      fs:   ``(B, N, H, W, 3)`` raw stack.
      fovs: ``(B, N)`` relative per-slice field-of-view factors.

    Returns:
      ``(warped_fs, motion)`` where motion is ``(B, N, 3)`` accumulated
      (alpha, beta, gamma).
    """
    ctx = ctx or Ctx()
    q = lambda n: f"{prefix}.{n}"  # noqa: E731
    b, n = fs.shape[0], fs.shape[1]

    # under ctx.remat each pyramid level and each warp+motion-volume+head
    # block recomputes its internals in the backward (layers.ckpt_stage) —
    # the head blocks are ideal checkpoints: full-res 34-channel internals
    # reduce to a (B, 10, 3) motion output
    def _pyr(names, stride):
        def f(c, pp, x):
            if stride == 1:
                # both blocks stride 1: one fused chain (eval TPU) / XLA pair
                return _rb_of_stack_apply(pp, [q(names[0]), q(names[1])], x, c)
            x = _rb_of_apply(pp, q(names[0]), x, c, stride=stride)
            return _rb_of_stack_apply(pp, [q(names[1])], x, c)
        return f

    _pyr1 = _pyr(("OF_feature.0", "OF_feature.1"), 1)
    _pyr2 = _pyr(("OF_feature1.0", "OF_feature1.1"), 2)
    fe1 = ckpt_stage(ctx, _pyr1, p, fs)
    fe2 = ckpt_stage(ctx, _pyr2, p, fe1)
    fe3 = ckpt_stage(ctx, _pyr(("OF_feature2.0", "OF_feature2.1"), 2), p, fe2)

    def _warp_head(head):
        def f(c, pp, feat, alpha, beta, gamma):
            feat_w, flow = affine_warp_stack(feat, alpha, beta, gamma)
            d = _head_apply(pp, q(head), _motion_volume(feat_w, flow), c)
            return d.at[:, :, 0].multiply(ALPHA_DAMPING)
        return f

    zeros = jnp.zeros((b, n), dtype=jnp.float32)
    motion = ckpt_stage(ctx, _warp_head("conv1"), p, fe3, fovs, zeros, zeros)

    delta = ckpt_stage(
        ctx, _warp_head("conv2"), p, fe2,
        motion[:, :, 0] + fovs, motion[:, :, 1], motion[:, :, 2]
    )
    motion = motion + delta

    delta = ckpt_stage(
        ctx, _warp_head("conv3"), p, fe1,
        motion[:, :, 0] + fovs, motion[:, :, 1], motion[:, :, 2]
    )
    motion = motion + delta

    warped, _ = affine_warp_stack(
        fs, motion[:, :, 0] + fovs, motion[:, :, 1], motion[:, :, 2]
    )
    return warped, motion


# ---------------------------------------------------------------------------
# End-to-end network (alignment + depth)
# ---------------------------------------------------------------------------


def e2e_network_specs() -> SpecTable:
    s = dffnet_specs("DFF_net")
    s.update(flownet_specs("optical_flow_aggregation"))
    return s


def e2e_apply(
    p: Dict[str, jax.Array],
    fs: jax.Array,
    focus_dists: jax.Array,
    fovs: jax.Array,
    ctx: Optional[Ctx] = None,
):
    """End-to-end forward (`End_to_End.py:14-17`, DFF variant returning the
    warped stack `:259`): ``(mid_out, pred1, pred2, pred3, warped_fs)``."""
    ctx = ctx or Ctx()
    warped, _ = flownet_apply(p, fs, fovs, ctx)
    outs = dffnet_apply(p, warped, focus_dists, ctx)
    return (*outs, warped)
