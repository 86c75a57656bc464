"""DFFNet — focus-measure pyramid, multi-scale cost aggregation, stacked
refinement hourglasses, and four softplus soft-argmax depth heads.

Rebuilds the behaviour of the reference ``DFF_net``
(`Depth_Estimation_Test/Depth_Estimation_Network.py:15-127`) in NDHWC layout as
pure functions; parameter keys equal the reference state_dict keys under the
``"DFF_net."`` prefix.

Resolution flow (focus axis N is never downsampled):
  FM_module 8ch@1/1 -> EFD+SRD 16ch@1/2 -> EFD+SRD 32ch@1/4 ->
  hourglassup 32ch@1/8 -> confidence head -> D1 ->
  dres0 64ch@1/8 -> deconv_1 -> hourglass(32)@1/4 -> D2 ->
  deconv_2 -> hourglass(16)@1/2 -> D3 -> deconv_3 -> hourglass(8)@1/1 -> D4.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dffx.ops import avg_pool3d, softplus_argmax, upsample_bilinear
from dffx.models.layers import (
    Ctx,
    SpecTable,
    apply_conv,
    apply_convbn,
    apply_deconvbn,
    bn_spec,
    ckpt_stage,
    conv_spec,
    convbn_spec,
    deconvbn_spec,
    efd_apply,
    efd_specs,
    fm_module_apply,
    fm_module_specs,
    relu,
    srd_apply,
    srd_specs,
)

# ---------------------------------------------------------------------------
# hourglass (PSMNet-style refinement with cross-hourglass skip state)
# ---------------------------------------------------------------------------


def hourglass_specs(s: SpecTable, pfx: str, c: int) -> None:
    convbn_spec(s, f"{pfx}.conv0.0", 2 * c, c, 3)
    convbn_spec(s, f"{pfx}.conv1.0", c, 2 * c, 3)
    # pre_conv exists in the reference constructor but is never used in its
    # forward (`Depth_Estimation_Network.py:249-250`); kept for checkpoint
    # compatibility.
    convbn_spec(s, f"{pfx}.pre_conv.0", 2 * c, 2 * c, 1)
    convbn_spec(s, f"{pfx}.conv2", 2 * c, 2 * c, 3)
    convbn_spec(s, f"{pfx}.conv3.0", 2 * c, 2 * c, 3)
    convbn_spec(s, f"{pfx}.conv4.0", 2 * c, 2 * c, 3)
    deconvbn_spec(s, f"{pfx}.conv5", 2 * c, 2 * c)
    deconvbn_spec(s, f"{pfx}.conv6", 2 * c, c)


def hourglass_apply(
    p, pfx, x, presqu, postsqu, ctx: Ctx
) -> Tuple[jax.Array, jax.Array]:
    """`Depth_Estimation_Network.py:265-284`; returns (out, pre_1)."""
    pre_1 = relu(apply_convbn(p, f"{pfx}.conv0.0", x, ctx, padding=1))
    out = relu(apply_convbn(p, f"{pfx}.conv1.0", pre_1, ctx, stride=(1, 2, 2), padding=1))
    pre = apply_convbn(p, f"{pfx}.conv2", out, ctx, padding=1)
    pre = relu(pre + postsqu) if postsqu is not None else relu(pre)
    out = relu(apply_convbn(p, f"{pfx}.conv3.0", pre, ctx, stride=(1, 2, 2), padding=1))
    out = relu(apply_convbn(p, f"{pfx}.conv4.0", out, ctx, padding=1))
    up = apply_deconvbn(p, f"{pfx}.conv5", out, ctx)
    out = relu(up + (presqu if presqu is not None else pre))
    out = apply_deconvbn(p, f"{pfx}.conv6", out, ctx)
    return out, pre_1


# ---------------------------------------------------------------------------
# hourglassup (multi-scale feature aggregation / "1st hourglass")
# ---------------------------------------------------------------------------


def hourglassup_specs(s: SpecTable, pfx: str, c: int) -> None:
    for name, cin, cout in [
        ("dres8_0", c, c),
        ("dres16_0", c, 2 * c),
        ("dres32_0", c, 2 * c),
    ]:
        convbn_spec(s, f"{pfx}.{name}.0", cin, cout, 3)
        convbn_spec(s, f"{pfx}.{name}.2", cout, cout, 3)
    for name, cc in [("dres8_1", c), ("dres16_1", 2 * c), ("dres32_1", 2 * c)]:
        convbn_spec(s, f"{pfx}.{name}.0", cc, cc, 3)
        convbn_spec(s, f"{pfx}.{name}.2", cc, cc, 3)
    conv_spec(s, f"{pfx}.conv1", c, 2 * c, (3, 3, 3))
    convbn_spec(s, f"{pfx}.conv2.0", 2 * c, 2 * c, 3)
    conv_spec(s, f"{pfx}.conv3", 2 * c, 4 * c, (3, 3, 3))
    convbn_spec(s, f"{pfx}.conv4.0", 4 * c, 4 * c, 3)
    deconvbn_spec(s, f"{pfx}.conv8", 4 * c, 2 * c)
    deconvbn_spec(s, f"{pfx}.conv9", 2 * c, c)
    convbn_spec(s, f"{pfx}.combine1.0", 4 * c, 2 * c, 3)
    convbn_spec(s, f"{pfx}.combine2.0", 6 * c, 4 * c, 3)
    convbn_spec(s, f"{pfx}.redir1", c, c, 1)
    convbn_spec(s, f"{pfx}.redir2", 2 * c, 2 * c, 1)
    # redir3 is constructed but unused by the reference forward (`:209`).
    convbn_spec(s, f"{pfx}.redir3", 4 * c, 4 * c, 1)


def _dres_pair(p, pfx0, pfx1, x, ctx: Ctx) -> jax.Array:
    """residual pair: dresX_1(dresX_0(x)) + dresX_0(x)."""
    r = relu(apply_convbn(p, f"{pfx0}.0", x, ctx, padding=1))
    r = relu(apply_convbn(p, f"{pfx0}.2", r, ctx, padding=1))
    y = relu(apply_convbn(p, f"{pfx1}.0", r, ctx, padding=1))
    y = apply_convbn(p, f"{pfx1}.2", y, ctx, padding=1)
    return y + r


def hourglassup_apply(p, pfx, x, ctx: Ctx) -> jax.Array:
    """`Depth_Estimation_Network.py:212-238`: avg-pool pyramid (1/8,1/16,1/32 of
    full res), per-scale residual branches, strided encoder with skip concats,
    two deconv decoders with 1x1 redir skips.  In 32ch@1/4, out 32ch@1/8."""
    x8 = avg_pool3d(x, (1, 2, 2))
    x16 = avg_pool3d(x, (1, 4, 4))
    x32 = avg_pool3d(x, (1, 8, 8))
    x8 = _dres_pair(p, f"{pfx}.dres8_0", f"{pfx}.dres8_1", x8, ctx)
    x16 = _dres_pair(p, f"{pfx}.dres16_0", f"{pfx}.dres16_1", x16, ctx)
    x32 = _dres_pair(p, f"{pfx}.dres32_0", f"{pfx}.dres32_1", x32, ctx)

    c1 = apply_conv(p, f"{pfx}.conv1", x8, ctx, stride=(1, 2, 2), padding=1)
    c1 = jnp.concatenate([c1, x16], axis=-1)
    c1 = relu(apply_convbn(p, f"{pfx}.combine1.0", c1, ctx, padding=1))
    c2 = relu(apply_convbn(p, f"{pfx}.conv2.0", c1, ctx, padding=1))

    c3 = apply_conv(p, f"{pfx}.conv3", c2, ctx, stride=(1, 2, 2), padding=1)
    c3 = jnp.concatenate([c3, x32], axis=-1)
    c3 = relu(apply_convbn(p, f"{pfx}.combine2.0", c3, ctx, padding=1))
    c4 = relu(apply_convbn(p, f"{pfx}.conv4.0", c3, ctx, padding=1))

    c8 = relu(apply_deconvbn(p, f"{pfx}.conv8", c4, ctx)
              + apply_convbn(p, f"{pfx}.redir2", c2, ctx))
    c9 = relu(apply_deconvbn(p, f"{pfx}.conv9", c8, ctx)
              + apply_convbn(p, f"{pfx}.redir1", x8, ctx))
    return c9


# ---------------------------------------------------------------------------
# DFFNet
# ---------------------------------------------------------------------------


def dffnet_specs(prefix: str = "DFF_net") -> SpecTable:
    s: SpecTable = {}
    q = lambda n: f"{prefix}.{n}"  # noqa: E731
    fm_module_specs(s, q("FM_measure"))
    efd_specs(s, q("FM_conv1.0"), 8, 16)
    srd_specs(s, q("FM_conv1.1"), 16)
    efd_specs(s, q("FM_conv2.0"), 16, 32)
    srd_specs(s, q("FM_conv2.1"), 32)
    hourglassup_specs(s, q("SPP_module"), 32)
    convbn_spec(s, q("confidence.0"), 32, 32, 3)
    conv_spec(s, q("confidence.2"), 32, 1, (3, 3, 3))
    convbn_spec(s, q("dres0.0"), 32, 64, 3)
    convbn_spec(s, q("dres0.2"), 64, 64, 3)
    deconvbn_spec(s, q("deconv_1"), 64, 32)
    hourglass_specs(s, q("dres2"), 32)
    deconvbn_spec(s, q("deconv_2"), 32, 16)
    hourglass_specs(s, q("dres3"), 16)
    deconvbn_spec(s, q("deconv_3"), 16, 8)
    hourglass_specs(s, q("dres4"), 8)
    conv_spec(s, q("classif1.0"), 32, 1, (1, 1, 1))
    conv_spec(s, q("classif2.0"), 16, 1, (1, 1, 1))
    conv_spec(s, q("classif3.0"), 8, 1, (1, 1, 1))
    return s


def network_specs() -> SpecTable:
    """Specs for the reference test-time ``Network`` wrapper (depth-only)."""
    return dffnet_specs("DFF_net")


def dffnet_apply(
    p: Dict[str, jax.Array],
    fs: jax.Array,
    focus_dists: jax.Array,
    ctx: Optional[Ctx] = None,
    prefix: str = "DFF_net",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Forward pass (`Depth_Estimation_Network.py:74-127`).

    Args:
      p:           flat parameter dict.
      fs:          ``(B, N, H, W, 3)`` focal stack in [-1, 1]; H, W % 32 == 0.
      focus_dists: ``(B, N)`` focus distances.
      ctx:         forward context (defaults to eval).

    Returns:
      ``(mid_out, pred1, pred2, pred3)`` each ``(B, H, W)``; ``pred3`` is the
      full-resolution head used for evaluation.
    """
    ctx = ctx or Ctx()
    q = lambda n: f"{prefix}.{n}"  # noqa: E731
    _, _, height, width, _ = fs.shape

    # under ctx.remat the full-resolution stages (FM module, the deconv_3 →
    # dres4 → classif3 tail, the soft-argmax heads) recompute their internals
    # in the backward — see layers.ckpt_stage for the measured rationale.
    # (A deeper mode that also recomputed the fm/half long-range skips from
    # fs existed through round 4; it was deleted in round 5 after the ladders
    # showed it losing on BOTH axes it existed for: slower at every batch
    # that compiles (113.7 vs 183.0 stacks/s at b128/224²) and a SMALLER
    # compile envelope at high res (E2E 448×800 b1: selective fits, deep
    # fails to allocate — its fused front span makes the peak working set
    # larger, not smaller).  ONCHIP_r05.jsonl e2e_train_ladder.)
    fm = ckpt_stage(
        ctx, lambda c, pp, xs: fm_module_apply(pp, q("FM_measure"), xs, c), p, fs
    )  # 8ch @ 1/1
    if ctx.use_packed and not ctx.train:
        # packed (s2d) downsampling: the strided conv reads the half-res
        # lattice at 4x channels; the maxpool is an exact phase max
        from dffx.models.packed import pack, packed_efd_apply

        e1 = packed_efd_apply(p, q("FM_conv1.0"), pack(fm), ctx)
        half = srd_apply(p, q("FM_conv1.1"), e1, ctx)
        e2 = packed_efd_apply(p, q("FM_conv2.0"), pack(half), ctx)
        quad = srd_apply(p, q("FM_conv2.1"), e2, ctx)
    else:

        def _stage1(c, pp, fm):
            return srd_apply(pp, q("FM_conv1.1"), efd_apply(pp, q("FM_conv1.0"), fm, c), c)

        def _stage2(c, pp, half):
            return srd_apply(pp, q("FM_conv2.1"), efd_apply(pp, q("FM_conv2.0"), half, c), c)

        half = ckpt_stage(ctx, _stage1, p, fm)
        quad = ckpt_stage(ctx, _stage2, p, half)

    vol = ckpt_stage(
        ctx, lambda c, pp, x: hourglassup_apply(pp, q("SPP_module"), x, c), p, quad
    )  # 32ch @ 1/8

    def _conf(c, pp, vol):
        y = relu(apply_convbn(pp, q("confidence.0"), vol, c, padding=1))
        return apply_conv(pp, q("confidence.2"), y, c, padding=1)[..., 0]

    conf = ckpt_stage(ctx, _conf, p, vol)  # (B,N,h8,w8)
    mid_out = ckpt_stage(
        ctx,
        lambda c, cost, fd: softplus_argmax(upsample_bilinear(cost, (height, width)), fd),
        conf, focus_dists,
    )  # D1

    def _dres0(c, pp, vol):
        x = relu(apply_convbn(pp, q("dres0.0"), vol, c, padding=1))
        x = relu(apply_convbn(pp, q("dres0.2"), x, c, padding=1))
        return apply_deconvbn(pp, q("deconv_1"), x, c)

    x = ckpt_stage(ctx, _dres0, p, vol)  # 32ch @ 1/4

    def _dres2(c, pp, x, quad):
        return hourglass_apply(pp, q("dres2"), jnp.concatenate([x, quad], -1), None, None, c)

    out, pre = ckpt_stage(ctx, _dres2, p, x, quad)
    out_in = x + out
    cost1 = apply_conv(p, q("classif1.0"), out_in, ctx)[..., 0]

    def _dres3(c, pp, out_in, half, pre, out):
        out2 = apply_deconvbn(pp, q("deconv_2"), out_in, c)  # 16ch @ 1/2
        o, pr = hourglass_apply(pp, q("dres3"), jnp.concatenate([out2, half], -1), pre, out, c)
        return out2, o, pr

    out2, out, pre = ckpt_stage(ctx, _dres3, p, out_in, half, pre, out)
    out_in = out2 + out
    cost2 = apply_conv(p, q("classif2.0"), out_in, ctx)[..., 0]

    if ctx.use_packed and not ctx.train:
        # exact space-to-depth evaluation of the FULL-RES stage only: the
        # up-deconv, hourglass ends, and classif head run with 4x the channels
        # at 1/4 the spatial positions (see models/packed.py).  Measured: the
        # 1/4- and 1/2-res stages LOSE from packing (their channel counts are
        # already MXU-adequate and the pack/unpack shuffles dominate).
        from dffx.models.packed import packed_stage_apply

        cost3 = packed_stage_apply(
            p, q, ("deconv_3", "dres4", "classif3.0"), out_in, fm, pre, out,
            ctx)
    else:

        def _tail(c, pp, out_in, fm, pre, out):
            out2 = apply_deconvbn(pp, q("deconv_3"), out_in, c)  # 8ch @ 1/1
            o, _ = hourglass_apply(
                pp, q("dres4"), jnp.concatenate([out2, fm], -1), pre, out, c
            )
            return apply_conv(pp, q("classif3.0"), out2 + o, c)[..., 0]

        cost3 = ckpt_stage(ctx, _tail, p, out_in, fm, pre, out)

    def _head(c, cost, fd):
        return softplus_argmax(upsample_bilinear(cost, (height, width)), fd)

    pred1 = ckpt_stage(ctx, _head, cost1, focus_dists)  # D2
    pred2 = ckpt_stage(ctx, _head, cost2, focus_dists)  # D3
    pred3 = ckpt_stage(
        ctx, lambda c, cost, fd: softplus_argmax(cost, fd), cost3, focus_dists
    )  # D4 (already full res)
    return mid_out, pred1, pred2, pred3
