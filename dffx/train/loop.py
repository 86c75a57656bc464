"""The jitted training step: forward (train-mode BN), weighted masked-MSE over
the four depth heads, Adam(0.9, 0.99), BN running-stat updates — one XLA
program, batch-sharded over the ``data`` mesh axis.

Faithful to the shared template of the reference ``train_code_*.py`` scripts
(`train_code_DDFF.py:143-168`): loss weights mid 0.3 / D2 0.5 / D3 0.7 /
D4 1.0, per-recipe pred/GT normalization quirks, optional confidence weighting
(Smartphone, `train_code_Smartphone.py:17-19`).

Under ``jax.jit`` with batch sharding, the batch statistics of BatchNorm are
computed over the *global* batch (sync-BN semantics) and gradients are
all-reduced by XLA — no hand-written collectives.  The reference's
``nn.DataParallel`` computed BN stats per replica; sync-BN is the strictly
more consistent choice and is documented here as an intentional deviation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import PartitionSpec as P

from dffx.models import Ctx, dffnet_apply, e2e_apply, trainable_mask
from dffx.parallel.mesh import DATA_AXIS


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Per-recipe loss shaping (SURVEY.md §2.3 'Per-recipe deltas')."""

    weights: Tuple[float, float, float, float] = (0.3, 0.5, 0.7, 1.0)  # mid, D2, D3, D4
    norm_range: Optional[Tuple[float, float]] = None  # (min, max) applied to preds+gt
    normalize_mid: bool = True  # HCI leaves mid_out unnormalized (train_code_HCI.py:134-137)
    conf_weighted: bool = False  # Smartphone confidence-weighted MSE


def _weighted_sq_sums(est, gt, w) -> Tuple[jax.Array, jax.Array]:
    """(numerator, denominator) of a weighted MSE — psum-able across shards."""
    w = w.astype(jnp.float32)
    return jnp.sum(w * jnp.square(est - gt)), jnp.sum(w)


def masked_mse(est: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean squared error over masked pixels (= torch MSELoss(est[mask], gt[mask]))."""
    num, den = _weighted_sq_sums(est, gt, mask)
    return num / jnp.maximum(den, 1.0)


def conf_masked_mse(est, gt, conf, mask) -> jax.Array:
    c = conf.astype(jnp.float32) * mask.astype(jnp.float32)
    num, den = _weighted_sq_sums(est, gt, c)
    return num / jnp.maximum(den, 1e-12)


def total_loss(
    outs: Tuple[jax.Array, ...],
    batch: Dict[str, jax.Array],
    cfg: LossConfig,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Weighted four-head loss.  With ``axis_name`` (inside shard_map), the
    MSE numerator/denominator are psum'd first, so the result equals the loss
    of the *gathered* global batch — exactly what ``nn.DataParallel`` computes
    on device 0 after the output gather (`train_code_DDFF.py:151-158`)."""
    mid, p1, p2, p3 = outs[:4]
    gt = batch["depth"]
    mask = batch["mask"]

    def norm(x):
        if cfg.norm_range is None:
            return x
        lo, hi = cfg.norm_range
        return (x - lo) / (hi - lo)

    gt_n = norm(gt)
    preds = [norm(p1), norm(p2), norm(p3)]
    mid_n = norm(mid) if cfg.normalize_mid else mid
    mid_gt = gt_n if cfg.normalize_mid else gt

    if cfg.conf_weighted:
        w_arr = batch["conf"].astype(jnp.float32) * mask.astype(jnp.float32)
        guard = 1e-12
    else:
        w_arr = mask
        guard = 1.0

    def term(est, gt_):
        num, den = _weighted_sq_sums(est, gt_, w_arr)
        if axis_name is not None:
            num = lax.psum(num, axis_name)
            den = lax.psum(den, axis_name)
        return num / jnp.maximum(den, guard)

    losses = [term(p, gt_n) for p in preds]
    mid_loss = term(mid_n, mid_gt)

    w_mid, w1, w2, w3 = cfg.weights
    total = w_mid * mid_loss + w1 * losses[0] + w2 * losses[1] + w3 * losses[2]
    return total, {
        "loss": total,
        "mid_loss": mid_loss,
        "loss1": losses[0],
        "loss2": losses[1],
        "loss3": losses[2],
    }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Dict[str, jax.Array]  # includes BN running stats
    opt_state: Any


def _make_optimizer(lr: float, params) -> optax.GradientTransformation:
    """Adam(betas=(0.9, 0.99)) on weights/biases only (`train_code_DDFF.py:66`);
    BN running statistics are excluded (torch's optimizer never sees buffers)."""
    mask = trainable_mask(params)
    return optax.masked(optax.adam(lr, b1=0.9, b2=0.99, eps=1e-8), mask)


def create_train_state(params: Dict[str, jax.Array], lr: float) -> TrainState:
    opt = _make_optimizer(lr, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt.init(params),
    )


def make_train_step(
    lr: float,
    loss_cfg: LossConfig,
    *,
    e2e: bool = False,
    compute_dtype=jnp.float32,
    donate: bool = True,
    remat: bool = False,
    bn_mode: str = "sync",
    mesh=None,
    debug_grads: bool = False,
    sanitize: bool = False,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted train step.

    The returned function takes ``(state, batch)`` where batch holds
    ``fs (B,N,H,W,3)``, ``depth (B,H,W)``, ``focus_dists (B,N)``,
    ``mask (B,H,W)`` and optionally ``conf`` / ``fovs``.

    ``remat=True`` turns on *selective* stage rematerialization
    (``Ctx.remat`` → ``layers.ckpt_stage``): the full-resolution stages — the
    FM module, the deconv_3 → dres4 → classif3 tail, and the four soft-argmax
    heads — recompute their internals in the backward instead of saving them
    (257 MB per full-res tensor at b32 224^2, bf16).  At b32 the step
    otherwise sits at 15.4 GiB temp and XLA spills via blind auto-remat /
    buffer compression (measured: 46% of device time in copies); selective
    remat removes that tax and unlocks larger per-chip batches.  (A
    whole-forward ``jax.checkpoint`` with the dots-saveable policy was
    measured at -23% throughput — conv outputs aren't dots, so it recomputed
    everything.  A ``"deep"`` mode that additionally recomputed the fm/half
    long-range skips from fs was deleted in round 5: it was slower at every
    batch that compiles and its fused front span *shrank* the high-res
    compile envelope — ONCHIP_r05.jsonl e2e_train_ladder.)

    ``bn_mode`` selects the BatchNorm-under-data-parallelism semantics:

    * ``"sync"`` (default): plain ``jit`` — XLA computes BN batch statistics
      over the *global* batch regardless of sharding (sync-BN; the strictly
      more consistent choice, mesh-invariant).
    * ``"per_shard"``: ``shard_map`` over the ``data`` axis of ``mesh`` —
      each shard computes BN statistics over its local sub-batch and running
      stats are kept from shard 0, faithfully reproducing the reference's
      ``nn.DataParallel`` (`train_code_DDFF.py:62`): per-replica batch stats,
      replica-0 buffer updates, loss over the gathered global outputs.
      Requires every batch leaf to be shardable on axis 0 over the data axis.

    ``sanitize=True`` fuses the in-graph numerics sanitizer into the step:
    ``logs["nonfinite_grads"]`` counts NaN/Inf elements across the gradient
    tree (one VPU reduction, ~free against the conv FLOPs; see
    ``dffx.utils.sanitize``).  The CLI's ``--sanitize`` checks it (and the
    loss) each step and raises a leaf-naming ``NonFiniteError`` on trigger.
    """
    if bn_mode not in ("sync", "per_shard"):
        raise ValueError(f"bn_mode must be 'sync' or 'per_shard', got {bn_mode!r}")
    if bn_mode == "per_shard" and mesh is None:
        raise ValueError("bn_mode='per_shard' requires a mesh")

    def forward(params, fs, batch):
        new_stats: Dict[str, jax.Array] = {}
        ctx = Ctx(train=True, new_stats=new_stats, compute_dtype=compute_dtype,
                  remat=bool(remat))
        if e2e:
            outs = e2e_apply(params, fs, batch["focus_dists"], batch["fovs"], ctx)
        else:
            outs = dffnet_apply(params, fs, batch["focus_dists"], ctx)
        return tuple(o.astype(jnp.float32) for o in outs[:4]), new_stats

    def loss_fn(trainables, stats, batch, axis_name=None):
        params = {**trainables, **stats}
        fs = batch["fs"].astype(compute_dtype)
        outs, new_stats = forward(params, fs, batch)
        total, logs = total_loss(outs, batch, loss_cfg, axis_name=axis_name)
        return total, (new_stats, logs)

    def _grads_sync(trainables, stats, batch):
        (_, (new_stats, logs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainables, stats, batch
        )
        return grads, new_stats, logs

    def _grads_per_shard(trainables, stats, batch):
        """shard_map body: params replicated, batch sharded on axis 0."""

        def local(trainables, stats, batch):
            (_, (new_stats, logs)), grads = jax.value_and_grad(
                lambda t: loss_fn(t, stats, batch, axis_name=DATA_AXIS),
                has_aux=True,
            )(trainables)
            # grads w.r.t. the replicated (invariant) params come out of the
            # vma-aware shard_map already psum'd across shards — no extra
            # reduction here (verified: an explicit psum double-counts)
            # nn.DataParallel's replica 0 IS the original module — only its
            # sub-batch updates the running statistics
            is0 = (lax.axis_index(DATA_AXIS) == 0).astype(jnp.float32)
            new_stats = jax.tree_util.tree_map(
                lambda s: lax.psum((s.astype(jnp.float32) * is0), DATA_AXIS).astype(s.dtype)
                if jnp.issubdtype(s.dtype, jnp.floating)
                else lax.psum(jnp.where(lax.axis_index(DATA_AXIS) == 0, s, jnp.zeros_like(s)), DATA_AXIS),
                new_stats,
            )
            return grads, new_stats, logs

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS)),
            out_specs=(P(), P(), P()),
        )(trainables, stats, batch)

    grads_fn = _grads_per_shard if bn_mode == "per_shard" else _grads_sync

    def step(state: TrainState, batch):
        mask = trainable_mask(state.params)
        trainables = {k: v for k, v in state.params.items() if mask[k]}
        stats = {k: v for k, v in state.params.items() if not mask[k]}
        grads, new_stats, logs = grads_fn(trainables, stats, batch)
        if debug_grads:
            logs = {**logs, "grads": grads}
        if sanitize:
            from dffx.utils.sanitize import nonfinite_count

            logs = {**logs, "nonfinite_grads": nonfinite_count(grads),
                    "grads": grads}  # kept on device; fetched only on trigger
        grads_full = {k: grads.get(k, jnp.zeros_like(v)) for k, v in state.params.items()}
        opt = _make_optimizer(lr, state.params)
        updates, new_opt_state = opt.update(grads_full, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params.update({k: v.astype(new_params[k].dtype) for k, v in new_stats.items()})
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state),
            logs,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_fn(*, e2e: bool = False, compute_dtype=jnp.float32, precision=None):
    """Jitted eval forward returning all four heads (+ warped stack if e2e)."""

    def fwd(params, batch):
        ctx = Ctx(train=False, compute_dtype=compute_dtype, precision=precision)
        fs = batch["fs"].astype(compute_dtype)
        if e2e:
            return e2e_apply(params, fs, batch["focus_dists"], batch["fovs"], ctx)
        return dffnet_apply(params, fs, batch["focus_dists"], ctx)

    return jax.jit(fwd)
