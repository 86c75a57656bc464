"""Shared building blocks: parameter specs, init, and apply helpers.

Conventions
-----------
* Activations are ``(B, N, H, W, C)``; parameters live in one flat dict whose
  keys equal the reference torch ``state_dict`` keys (values are stored in
  TPU-friendly layouts: conv kernels ``(kd, kh, kw, Cin, Cout)``).
* Each reference block has a ``*_specs`` function that registers its parameter
  shapes/initializers into a spec table, and an ``*_apply`` function with the
  forward math.  The two mirror the reference constructors/forwards
  (`Depth_Estimation_Test/Depth_Estimation_Network.py`) one-to-one so the key
  namespace matches mechanically.
* ``Ctx`` threads train/eval mode, the updated-BN-statistics accumulator, an
  optional mesh axis for sync-BN, and the XLA precision knob through the
  forward functions — everything stays a pure function.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dffx.ops import batch_norm, batch_norm_train, conv3d, deconv3d, max_pool3d

# ---------------------------------------------------------------------------
# Parameter specs + initialization
# ---------------------------------------------------------------------------

#: spec entry: (kind, shape) where kind selects the init distribution
#:   'conv_msra'    Conv3d inside DFF_net: N(0, sqrt(2 / (prod(k) * cout)))
#:                  (reference init loop, Depth_Estimation_Network.py:59-73)
#:   'conv_default' Conv3d outside the init loop (FlowNetwork): torch default
#:                  kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(cin * prod(k)))
#:   'deconv'       ConvTranspose3d (not matched by the init loop's
#:                  isinstance(nn.Conv3d)): U(+-1/sqrt(cout * prod(k)))
#:   'bias'         conv bias: U(+-1/sqrt(fan_in))
#:   'bn_weight'/'bn_bias'/'bn_mean'/'bn_var'/'bn_count'  BatchNorm tensors
Spec = Tuple[str, tuple]
SpecTable = Dict[str, Spec]


def conv_spec(s: SpecTable, pfx: str, cin: int, cout: int, k, *, bias: bool = False,
              kind: str = "conv_msra") -> None:
    k = k if isinstance(k, tuple) else (k, k, k)
    s[f"{pfx}.weight"] = (kind, (*k, cin, cout))
    if bias:
        s[f"{pfx}.bias"] = ("bias", (cout,), cin * math.prod(k))


def deconv_spec(s: SpecTable, pfx: str, cin: int, cout: int, k=3) -> None:
    k = k if isinstance(k, tuple) else (k, k, k)
    s[f"{pfx}.weight"] = ("deconv", (*k, cin, cout))


def bn_spec(s: SpecTable, pfx: str, c: int) -> None:
    s[f"{pfx}.weight"] = ("bn_weight", (c,))
    s[f"{pfx}.bias"] = ("bn_bias", (c,))
    s[f"{pfx}.running_mean"] = ("bn_mean", (c,))
    s[f"{pfx}.running_var"] = ("bn_var", (c,))
    s[f"{pfx}.num_batches_tracked"] = ("bn_count", ())


def convbn_spec(s: SpecTable, pfx: str, cin: int, cout: int, k, *,
                kind: str = "conv_msra") -> None:
    """``convbn_3d`` = Sequential(Conv3d(bias=False), BatchNorm3d)."""
    conv_spec(s, f"{pfx}.0", cin, cout, k, kind=kind)
    bn_spec(s, f"{pfx}.1", cout)


def deconvbn_spec(s: SpecTable, pfx: str, cin: int, cout: int) -> None:
    """Sequential(ConvTranspose3d(bias=False), BatchNorm3d)."""
    deconv_spec(s, f"{pfx}.0", cin, cout, 3)
    bn_spec(s, f"{pfx}.1", cout)


def init_params(specs: SpecTable, seed: int = 0) -> Dict[str, jax.Array]:
    """Sample a fresh parameter dict with reference-matching distributions."""
    rng = np.random.default_rng(seed)
    out: Dict[str, np.ndarray] = {}
    for key, spec in sorted(specs.items()):
        kind, shape = spec[0], spec[1]
        if kind == "conv_msra":
            *k, _cin, cout = shape
            std = math.sqrt(2.0 / (math.prod(k) * cout))
            v = rng.normal(0.0, std, size=shape)
        elif kind == "conv_default":
            *k, cin, _cout = shape
            bound = 1.0 / math.sqrt(cin * math.prod(k))
            v = rng.uniform(-bound, bound, size=shape)
        elif kind == "deconv":
            *k, _cin, cout = shape
            bound = 1.0 / math.sqrt(cout * math.prod(k))
            v = rng.uniform(-bound, bound, size=shape)
        elif kind == "bias":
            fan_in = spec[2]
            bound = 1.0 / math.sqrt(fan_in)
            v = rng.uniform(-bound, bound, size=shape)
        elif kind in ("bn_weight", "bn_var"):
            v = np.ones(shape)
        elif kind in ("bn_bias", "bn_mean"):
            v = np.zeros(shape)
        elif kind == "bn_count":
            out[key] = np.zeros(shape, dtype=np.int64)
            continue
        else:
            raise ValueError(f"unknown spec kind {kind!r} for {key}")
        out[key] = v.astype(np.float32)
    return {k: jnp.asarray(v) for k, v in out.items()}


def trainable_mask(params: Dict[str, Any]) -> Dict[str, bool]:
    """True for optimizable tensors, False for BN running statistics."""
    return {
        k: not (
            k.endswith(".running_mean")
            or k.endswith(".running_var")
            or k.endswith(".num_batches_tracked")
        )
        for k in params
    }


# ---------------------------------------------------------------------------
# Apply-side helpers
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Ctx:
    """Forward-pass context threaded through the pure model functions."""

    train: bool = False
    new_stats: Optional[Dict[str, jax.Array]] = None  # filled in train mode
    bn_axis: Optional[str] = None  # mesh axis name for sync-BN (None = per-shard)
    precision: Any = None  # lax precision for convolutions
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False  # fused TPU kernels for the full-res hot stages (eval)
    use_packed: bool = False  # exact space-to-depth eval of the full-res tail
    remat: bool = False  # recompute full-res stage internals in the backward
    # (a deeper remat mode that also recomputed the fm/half long-range skips
    # was deleted in r5: it measured slower at every batch that compiles AND
    # shrank the compile envelope at high res — ONCHIP_r05 e2e_train_ladder)
    # serving mesh with a >1 'spatial' axis: run the fused Pallas chains
    # H-sharded via one halo exchange per chain (dffx.ops.halo) instead of
    # forcing the XLA path (GSPMD cannot partition a pallas_call)
    spatial_mesh: Any = None


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def ckpt_stage(ctx: Ctx, fn, *args):
    """``jax.checkpoint`` around one model stage.

    With ``ctx.remat`` the stage's internal activations are recomputed from the
    stage *inputs* during the backward pass instead of living in HBM between
    forward and backward.  Targeted at the full-resolution stages, whose saved
    activations (257 MB each at b32 224^2 x 10 slices, bf16) otherwise push the
    b32 train step past v5e's 16 GiB and trigger XLA's blind auto-remat /
    buffer-compression spills (trace: ``remat_uncompressed`` copies, 46% of
    device time in copies — tools/profile_trace.py).

    BN new-stats produced inside the stage are routed out as explicit
    checkpoint outputs and merged back into ``ctx.new_stats`` — a side-effect
    dict write cannot cross a ``jax.checkpoint`` boundary (the inner tracers
    would escape).  ``fn`` receives ``(inner_ctx, *args)`` and must take every
    traced input (including params) as an explicit argument, not a closure,
    so gradients flow through the checkpoint correctly.
    """
    if not ctx.remat:
        return fn(ctx, *args)

    def inner(*a):
        sub: Optional[Dict[str, jax.Array]] = {} if ctx.new_stats is not None else None
        ictx = dataclasses.replace(ctx, new_stats=sub, remat=False)
        return fn(ictx, *a), sub

    out, sub = jax.checkpoint(inner)(*args)
    if sub:
        ctx.new_stats.update(sub)
    return out


def apply_bn(p: Dict[str, jax.Array], pfx: str, x: jax.Array, ctx: Ctx) -> jax.Array:
    if ctx.train:
        y, new_mean, new_var = batch_norm_train(
            x,
            p[f"{pfx}.running_mean"],
            p[f"{pfx}.running_var"],
            p[f"{pfx}.weight"],
            p[f"{pfx}.bias"],
            axis_name=ctx.bn_axis,
        )
        if ctx.new_stats is not None:
            ctx.new_stats[f"{pfx}.running_mean"] = new_mean
            ctx.new_stats[f"{pfx}.running_var"] = new_var
            ctx.new_stats[f"{pfx}.num_batches_tracked"] = (
                p[f"{pfx}.num_batches_tracked"] + 1
            )
        return y
    return batch_norm(
        x,
        p[f"{pfx}.running_mean"],
        p[f"{pfx}.running_var"],
        p[f"{pfx}.weight"],
        p[f"{pfx}.bias"],
    )


def apply_conv(p, pfx, x, ctx: Ctx, *, stride=1, padding=0, dilation=1) -> jax.Array:
    w = p[f"{pfx}.weight"].astype(x.dtype)
    y = conv3d(x, w, stride=stride, padding=padding, dilation=dilation,
               precision=ctx.precision)
    if f"{pfx}.bias" in p:
        y = y + p[f"{pfx}.bias"].astype(y.dtype)
    return y


def apply_convbn(p, pfx, x, ctx: Ctx, *, stride=1, padding=0, dilation=1) -> jax.Array:
    y = apply_conv(p, f"{pfx}.0", x, ctx, stride=stride, padding=padding, dilation=dilation)
    return apply_bn(p, f"{pfx}.1", y, ctx)


def apply_deconvbn(p, pfx, x, ctx: Ctx) -> jax.Array:
    """Sequential(ConvTranspose3d(k3, p1, op=(0,1,1), s=(1,2,2)), BN) — the only
    deconv configuration the reference uses."""
    w = p[f"{pfx}.0.weight"].astype(x.dtype)
    y = deconv3d(x, w, stride=(1, 2, 2), padding=1, output_padding=(0, 1, 1),
                 precision=ctx.precision)
    return apply_bn(p, f"{pfx}.1", y, ctx)


# ---------------------------------------------------------------------------
# Reference blocks (specs + apply): resnet_block_2d, SRD, EFD, FM_module
# ---------------------------------------------------------------------------


def resnet_block_2d_specs(s: SpecTable, pfx: str, c: int) -> None:
    convbn_spec(s, f"{pfx}.conv.0", c, c, (1, 3, 3))
    convbn_spec(s, f"{pfx}.conv.2", c, c, (1, 3, 3))


def resnet_block_2d_apply(p, pfx, x, ctx: Ctx) -> jax.Array:
    """Two (1,3,3) convbn with residual (`Depth_Estimation_Network.py:295-304`)."""
    y = relu(apply_convbn(p, f"{pfx}.conv.0", x, ctx, padding=(0, 1, 1)))
    y = apply_convbn(p, f"{pfx}.conv.2", y, ctx, padding=(0, 1, 1))
    return relu(x + y)


def srd_specs(s: SpecTable, pfx: str, c: int) -> None:
    resnet_block_2d_specs(s, f"{pfx}.Focus_Measure", c)
    conv_spec(s, f"{pfx}.N_ch_attention.0", c, c, (3, 1, 1))
    conv_spec(s, f"{pfx}.N_ch_attention.2", c, c, (1, 1, 1))


# Round 2: the kernels stream two row-blocks per tile and split W internally
# (lane padding + halo'd recursion), so the fused path covers every real eval
# shape — DDFF 384x576, HCI 512x512, Middlebury/FlyingThings 544x960+ — not
# just the 384^2 bench shape round 1's whole-slice BlockSpecs were capped to.
# Only the row-tile divisibility remains as a gate.


def _pallas_shape_ok(h: int, w: int) -> bool:
    return h % 16 == 0 and w >= 32


def _srd_pallas_ok(ctx: Ctx, x) -> bool:
    # Policy (measured in-context, round 2): fuse only the FULL-RES stage
    # (C=8).  The kernels support C<=32 and beat XLA in isolation at half/
    # quarter res too, but inside the whole graph the layout transposes cost
    # more than they save there (e.g. 384^2: 26.6 ms full-res-only vs 29.7
    # all-res; Middlebury 141 vs 151) — XLA fuses the mid-res SRDs with their
    # surrounding ops.  tools/tpu_gate.py still verifies the wider capability.
    from dffx.ops.halo import spatial_active

    if spatial_active(ctx.spatial_mesh):
        # standalone fused SRD is not halo-wrapped (only the fm_module chain
        # is); running it on an H-sharded array would force an all-gather
        return False
    return (
        ctx.use_pallas
        and not ctx.train
        and x.shape[-1] <= 8
        and _pallas_shape_ok(x.shape[2], x.shape[3])
    )


def _srd_apply_cf(p, pfx, xs, b: int, n: int, ctx: Ctx) -> jax.Array:
    """Channel-first fused SRD: xs (B*N, C, H, W) → same.  Chains the residual
    conv pair and the focus-axis attention kernels without layout transposes."""
    from dffx.ops.pallas_kernels import (
        bn_fused_affine,
        rb2d_residual_cf,
        srd_attention_residual_cf,
    )

    c = xs.shape[1]
    rb = f"{pfx}.Focus_Measure.conv"
    aff1 = bn_fused_affine(
        p[f"{rb}.0.1.weight"], p[f"{rb}.0.1.bias"],
        p[f"{rb}.0.1.running_mean"], p[f"{rb}.0.1.running_var"],
    )
    aff2 = bn_fused_affine(
        p[f"{rb}.2.1.weight"], p[f"{rb}.2.1.bias"],
        p[f"{rb}.2.1.running_mean"], p[f"{rb}.2.1.running_var"],
    )
    f = rb2d_residual_cf(
        xs, p[f"{rb}.0.0.weight"].astype(xs.dtype), aff1,
        p[f"{rb}.2.0.weight"].astype(xs.dtype), aff2,
    )
    h, wd = f.shape[2], f.shape[3]
    out = srd_attention_residual_cf(
        f.reshape(b, n * c, h, wd),
        p[f"{pfx}.N_ch_attention.0.weight"].astype(xs.dtype),
        p[f"{pfx}.N_ch_attention.2.weight"].astype(xs.dtype),
        n=n, c=c,
    )
    return out.reshape(b * n, c, h, wd)


def srd_apply(p, pfx, x, ctx: Ctx) -> jax.Array:
    """Stack-reduction block: spatial residual features plus additive focus-axis
    attention (`Depth_Estimation_Network.py:317-330`).

    Eval mode on TPU (``ctx.use_pallas``): runs as two fused Pallas kernels
    (residual conv pair, then attention) — XLA's lowering of these tiny-channel
    (1,3,3)/(3,1,1) convs is ~20x off the bandwidth bound."""
    if _srd_pallas_ok(ctx, x):
        b, n, h, wd, c = x.shape
        xs = x.reshape(b * n, h, wd, c).transpose(0, 3, 1, 2)
        out = _srd_apply_cf(p, pfx, xs, b, n, ctx)
        return out.transpose(0, 2, 3, 1).reshape(b, n, h, wd, c)
    f = resnet_block_2d_apply(p, f"{pfx}.Focus_Measure", x, ctx)
    a = relu(apply_conv(p, f"{pfx}.N_ch_attention.0", f, ctx, padding=(1, 0, 0)))
    a = relu(apply_conv(p, f"{pfx}.N_ch_attention.2", a, ctx))
    return f + a


def efd_specs(s: SpecTable, pfx: str, cin: int, cout: int) -> None:
    convbn_spec(s, f"{pfx}.stride_conv", cin, cout, (3, 3, 3))
    convbn_spec(s, f"{pfx}.max_pooling.1", cin, cout, (3, 3, 3))


def efd_apply(p, pfx, x, ctx: Ctx) -> jax.Array:
    """Dual-branch spatial downsampling: strided conv + maxpool-conv, summed
    (`Depth_Estimation_Network.py:306-315`).  Never strides the focus axis."""
    a = apply_convbn(p, f"{pfx}.stride_conv", x, ctx, stride=(1, 2, 2), padding=1)
    b = apply_convbn(p, f"{pfx}.max_pooling.1", max_pool3d(x, (1, 2, 2)), ctx, padding=1)
    return relu(a + b)


def fm_module_specs(s: SpecTable, pfx: str) -> None:
    convbn_spec(s, f"{pfx}.Focus_extraction.0", 3, 8, (1, 9, 9))
    srd_specs(s, f"{pfx}.Focus_extraction.2", 8)


def _fm_fused_chain(p, pfx, x, ctx: Ctx) -> jax.Array:
    """The fused full-res chain, NDHWC in/out: dilated conv+BN+ReLU then the
    SRD pair, all channel-first Pallas kernels.  Row-local with receptive
    radius 10 (8 dilated + 2 rb2d + 0 attention) and zero-pad edge semantics —
    the contract ``dffx.ops.halo.halo_sharded_chain`` relies on."""
    from dffx.ops.pallas_kernels import bn_fused_affine, fm_conv_bn_relu_cf

    b, n, h, wd, _ = x.shape
    bnp = f"{pfx}.Focus_extraction.0.1"
    scale, shift = bn_fused_affine(
        p[f"{bnp}.weight"], p[f"{bnp}.bias"],
        p[f"{bnp}.running_mean"], p[f"{bnp}.running_var"],
    )
    w = p[f"{pfx}.Focus_extraction.0.0.weight"].astype(x.dtype)
    xs = x.reshape(b * n, h, wd, 3).transpose(0, 3, 1, 2)
    y = fm_conv_bn_relu_cf(xs, w, scale, shift)  # (BN, 8, H, W)
    out = _srd_apply_cf(p, f"{pfx}.Focus_extraction.2", y, b, n, ctx)
    return out.transpose(0, 2, 3, 1).reshape(b, n, h, wd, 8)


def fm_module_apply(p, pfx, x, ctx: Ctx) -> jax.Array:
    """Full-resolution focus-measure extraction: dilated (1,9,9) conv (17x17
    receptive field per slice) + SRD (`Depth_Estimation_Network.py:131-143`).

    In eval mode on TPU (``ctx.use_pallas``) the dilated conv+BN+ReLU and the
    SRD run as chained channel-first Pallas kernels — one layout transpose in
    (3-channel input, cheap) and one out, instead of one per kernel.  With
    ``ctx.spatial_mesh`` the chain runs H-sharded (one halo exchange)."""
    def xla_chain(xl, pp):
        y = relu(
            apply_convbn(pp, f"{pfx}.Focus_extraction.0", xl, ctx,
                         padding=(0, 8, 8), dilation=(1, 2, 2))
        )
        return srd_apply(pp, f"{pfx}.Focus_extraction.2", y, ctx)

    if ctx.use_pallas and not ctx.train:
        from dffx.ops.halo import (HALO, halo_sharded_chain, spatial_active,
                                   spatial_ok)

        h, wd = x.shape[2], x.shape[3]
        if spatial_ok(ctx.spatial_mesh, h):
            s = ctx.spatial_mesh.shape["spatial"]
            if _pallas_shape_ok(h // s + 2 * HALO, wd):
                # edge_fn = the XLA twin: recomputes the few true-edge rows
                # the zero halo can't make exact (dffx.ops.halo docstring);
                # _srd_pallas_ok already forces its XLA path under a spatial
                # mesh, so xla_chain is pallas-free here
                return halo_sharded_chain(
                    lambda xl, pp: _fm_fused_chain(pp, pfx, xl, ctx),
                    x, ctx.spatial_mesh, p, edge_fn=xla_chain,
                    # declared bleed 2: the dilated first conv is linear over
                    # the fake zero rows, only the rb2d pair propagates
                    bleed=2,
                )
        elif (not spatial_active(ctx.spatial_mesh)
              and h % 32 == 0 and _pallas_shape_ok(h, wd)):
            # unsharded fused chain ONLY when no spatial mesh is live: with
            # H-sharded inputs an unwrapped pallas_call would make GSPMD
            # all-gather the stack — worse than the per-stage XLA fallback
            return _fm_fused_chain(p, pfx, x, ctx)
    return xla_chain(x, p)
