"""Training CLI — one driver for all five reference recipes.

    python -m dffx.train.cli --recipe DDFF --lr 1e-4
        [--saveroot train_test/] [--max_epoch N] [--load_epoch N]
        [--batch_size 4] [--cpus 10] [--data-root Datasets/]

Flag names follow the reference scripts (`train_code_DDFF.py:22-29`); training
is batch-sharded over all local TPU devices (the ``data`` mesh axis) with the
jitted step from ``dffx.train.loop``; checkpoints are written per epoch under
``saveroot/models/`` and TensorBoard scalars under ``saveroot/logs`` with the
reference's tag names.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from dffx import checkpoint as ckpt
from dffx import metrics as M
from dffx.data import Loader, device_prefetch
from dffx.models import e2e_network_specs, init_params, network_specs
from dffx.parallel import batch_sharding, make_mesh
from dffx.parallel import distributed
from dffx.train.loop import TrainState, create_train_state, make_eval_fn, make_train_step
from dffx.train.recipes import RECIPES
from dffx.utils.tensorboard import SummaryWriter


class _NullWriter:
    """Writer stand-in for non-primary hosts (only process 0 logs)."""

    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass


def _validate(eval_fn, params, dataset, recipe, writer, epoch):
    sums = {m: 0.0 for m in recipe.val_metrics}
    val_time = 0.0
    n = len(dataset)
    for idx in range(n):
        s = dataset[idx]
        batch = {
            "fs": jnp.asarray(s["fs"][None]),
            "focus_dists": jnp.asarray(s["focus_dists"][None]),
        }
        if recipe.e2e:
            batch["fovs"] = jnp.asarray(s["fovs"][None])
        t0 = time.time()
        outs = jax.block_until_ready(eval_fn(params, batch))
        val_time += time.time() - t0
        pred = np.asarray(outs[3], dtype=np.float32)[0]
        h, w = s["unpadded"]
        pred = pred[:h, :w]
        if recipe.val_crop_rows:
            pred = pred[: recipe.val_crop_rows]
            gt = s["depth"][: recipe.val_crop_rows]
            mask = s["mask"][: recipe.val_crop_rows]
        else:
            gt, mask = s["depth"], s["mask"]
        for m in recipe.val_metrics:
            if m == "bumpiness":
                sums[m] += M.get_bumpiness(gt, pred, mask)
            elif m.startswith("accuracy"):
                sums[m] += M.mask_accuracy_k(pred, gt, int(m[-1]), mask)
            elif recipe.loss.conf_weighted:
                fn = {"mse": M.mask_mse_w_conf, "mae": M.mask_mae_w_conf}[m]
                sums[m] += fn(pred, gt, s["conf"], mask)
            else:
                sums[m] += getattr(M, f"mask_{m}")(pred, gt, mask)
    for m in recipe.val_metrics:
        label = "Avg_Bulmp" if m == "bumpiness" else f"Avg_{m}"
        print(f"{label}({epoch}) : ", sums[m] / n)
        writer.add_scalar(f"Loss/validation/DFF/{label}", sums[m] / n, epoch)
    print("AVG_time:", val_time / n)


_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "resource_exhausted", "Out of memory",
                "out of memory", "exceeds the limit", "Ran out of memory")


def _with_remat_hint(step_fn, *, remat, batch_size):
    """Wrap the train step so an HBM compile/alloc failure without ``--remat``
    surfaces as an actionable message instead of a raw XLA error (batch >= 48
    at the 224^2 crop does not compile un-rematerialized; measured r3)."""
    ran_once = False

    def run(state, batch):
        nonlocal ran_once
        try:
            out = step_fn(state, batch)
        except Exception as e:
            msg = str(e)
            if not ran_once and not remat and any(m in msg for m in _OOM_MARKERS):
                raise RuntimeError(
                    f"[dffx] train step does not fit in device memory at "
                    f"batch_size={batch_size} without rematerialization — "
                    "rerun with --remat (measured 3.3x throughput at b128 "
                    "vs b32 plain).  Original error:\n" + msg[:800]
                ) from e
            raise
        ran_once = True
        return out

    return run


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train code: Depth from focus (dffx/TPU)")
    parser.add_argument("--recipe", type=str, required=True, choices=sorted(RECIPES))
    parser.add_argument("--saveroot", default="train_test/", type=str)
    parser.add_argument("--lr", type=float, required=True)
    parser.add_argument("--max_epoch", default=None, type=int)
    parser.add_argument("--load_epoch", default=0, type=int,
                        help="epoch to resume from; -1 resumes the latest checkpoint")
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--cpus", default=10, type=int, help="decoder threads")
    parser.add_argument("--data-root", default="Datasets/", type=str)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--steps-per-epoch", default=None, type=int,
                        help="cap train steps per epoch (smoke tests)")
    parser.add_argument("--bn_mode", default="sync", choices=["sync", "per_shard"],
                        help="BatchNorm semantics under data parallelism: "
                             "'sync' (global-batch stats) or 'per_shard' "
                             "(nn.DataParallel-faithful per-replica stats)")
    parser.add_argument("--remat", nargs="?", const="on", default="off",
                        choices=["on"],
                        help="recompute stage activations in the backward "
                             "(selective jax.checkpoint) — required for "
                             "batch>=48 per chip at the 224^2 crop; measured "
                             "3.3x train throughput at b128 vs b32 plain. "
                             "(A 'deep' level was deleted in r5: slower at "
                             "every batch that compiles and a smaller "
                             "high-res compile envelope, ONCHIP_r05)")
    parser.add_argument("--sanitize", action="store_true",
                        help="in-graph numerics sanitizer: count NaN/Inf in "
                             "the gradients every step (one fused reduction, "
                             "~free) and fail fast with the offending leaf "
                             "names instead of training on into garbage "
                             "(dffx.utils.sanitize)")
    parser.add_argument("--coordinator", default=None, type=str,
                        help="multi-host: coordinator address host:port "
                             "(or DFFX_COORDINATOR env)")
    parser.add_argument("--num_processes", default=None, type=int,
                        help="multi-host: total process count (or DFFX_NUM_PROCESSES)")
    parser.add_argument("--process_id", default=None, type=int,
                        help="multi-host: this process's id (or DFFX_PROCESS_ID)")
    args = parser.parse_args(argv)

    # multi-host (DCN) data parallelism: join the cluster before any JAX call
    distributed.initialize(args.coordinator, args.num_processes, args.process_id)
    primary = distributed.is_primary()

    from dffx.utils.profiling import enable_persistent_cache

    enable_persistent_cache()  # crash-resume skips the multi-minute recompile

    recipe = RECIPES[args.recipe]
    max_epoch = args.max_epoch if args.max_epoch is not None else recipe.max_epoch
    root = args.saveroot
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    writer = SummaryWriter(os.path.join(root, "logs")) if primary else _NullWriter()

    mesh = make_mesh()  # spans every device of every host
    n_dev = mesh.devices.size
    assert args.batch_size % n_dev == 0 or n_dev == 1, (
        f"batch_size {args.batch_size} must divide over {n_dev} devices"
    )

    train_ds, val_ds = recipe.make_datasets(args.data_root, args.seed)

    specs = e2e_network_specs() if recipe.e2e else network_specs()
    auto_resume = args.load_epoch == -1
    if auto_resume:
        # crash recovery: resume from the newest checkpoint on disk
        existing = sorted(
            (int(f.split(".")[0]) for f in os.listdir(os.path.join(root, "models"))
             if f.endswith(".ckpt") and f.split(".")[0].isdigit()),
            reverse=True,
        )
        args.load_epoch = existing[0] if existing else 0
        print(f"[dffx] auto-resume from epoch {args.load_epoch}")
    # Auto-resume loads ANY saved epoch (>= 1); only the explicit reference
    # flag keeps the reference's `load_epoch > 1` quirk (train_code_DDFF.py:63)
    # — otherwise a crash right after the first save would silently restart
    # from random weights while printing "auto-resume from epoch 1".
    state = create_train_state(init_params(specs, seed=args.seed), lr=args.lr)
    if args.load_epoch >= 1 if auto_resume else args.load_epoch > 1:
        # the fresh state doubles as the load template (v2 checkpoints store
        # leaves + paths, not pickled optax internals); legacy v1 pickles
        # come back as the same dict structure
        blob = ckpt.load(
            os.path.join(root, "models", f"{args.load_epoch}.ckpt"),
            template={"step": state.step, "params": state.params,
                      "opt_state": state.opt_state},
        )
        state = TrainState(
            step=jnp.asarray(blob["step"]),
            params={k: jnp.asarray(v) for k, v in blob["params"].items()},
            opt_state=jax.tree_util.tree_map(jnp.asarray, blob["opt_state"]),
        )

    remat = args.remat == "on"
    step_fn = make_train_step(args.lr, recipe.loss, e2e=recipe.e2e,
                              bn_mode=args.bn_mode, mesh=mesh,
                              remat=remat, sanitize=args.sanitize)
    step_fn = _with_remat_hint(step_fn, remat=remat, batch_size=args.batch_size)
    eval_fn = make_eval_fn(e2e=recipe.e2e)
    sharding = batch_sharding(mesh)

    # replicate the state over the (possibly multi-host) mesh so jit treats
    # params/opt state as global arrays alongside the batch-sharded inputs
    from dffx.parallel import replicate

    if mesh.devices.size > 1:
        state = jax.device_put(state, replicate(mesh))

    num_train = len(train_ds) // args.batch_size
    start = time.time()
    # loss sums accumulate across print_epoch epochs, like the reference
    # (train_code_HCI.py prints/averages every 10 epochs)
    sums = dict(total=0.0, mid=0.0, l1=0.0, l2=0.0, l3=0.0, steps=0.0)
    pending_save = None
    for epoch in range(args.load_epoch, max_epoch + 1):
        if epoch % recipe.save_epoch == 0 and epoch != args.load_epoch and primary:
            if pending_save is not None:
                pending_save.wait()
            pending_save = ckpt.save_async(
                os.path.join(root, "models", f"{epoch}.ckpt"),
                {"step": state.step, "params": state.params, "opt_state": state.opt_state},
            )
        if epoch % recipe.test_epoch == 0 and primary:
            # multi-host: validation runs on the primary's local device only,
            # so hand it host-local copies rather than global-mesh arrays
            val_params = (
                jax.tree_util.tree_map(np.asarray, state.params)
                if jax.process_count() > 1 else state.params
            )
            _validate(eval_fn, val_params, val_ds, recipe, writer, epoch)

        loader = Loader(
            train_ds,
            args.batch_size,
            shuffle=True,
            drop_last=True,
            num_threads=args.cpus,
            seed=args.seed + epoch,
            process_id=jax.process_index(),
            process_count=jax.process_count(),
        )
        steps = 0
        for batch in device_prefetch(iter(loader), sharding=sharding):
            batch = {
                k: v for k, v in batch.items() if k in ("fs", "depth", "focus_dists", "mask", "conf", "fovs")
            }
            state, logs = step_fn(state, batch)
            if args.sanitize:
                import math

                if not math.isfinite(float(logs["loss"])) or int(logs["nonfinite_grads"]):
                    from dffx.utils.sanitize import raise_nonfinite

                    raise_nonfinite(
                        f"non-finite numerics at step {int(state.step)} "
                        f"(loss={float(logs['loss'])}, "
                        f"nonfinite grad elements={int(logs['nonfinite_grads'])})",
                        {"grads": logs["grads"], "batch": batch,
                         "params": state.params},
                    )
            sums["total"] += float(logs["loss"])
            sums["mid"] += float(logs["mid_loss"])
            sums["l1"] += float(logs["loss1"])
            sums["l2"] += float(logs["loss2"])
            sums["l3"] += float(logs["loss3"])
            sums["steps"] += 1.0
            steps += 1
            if args.steps_per_epoch and steps >= args.steps_per_epoch:
                break

        if epoch % recipe.print_epoch == 0 and primary:
            # actual accumulated steps, not num_train * print_epoch — the two
            # agree in the reference-shaped run, but --steps-per-epoch caps an
            # epoch short and would otherwise deflate the printed average
            denom = max(sums["steps"], 1.0)
            print("Epoch:", epoch)
            print("AVG_DFF_TotalLoss:", sums["total"] / denom)
            print("Time:", time.time() - start)
            writer.add_scalar("Loss/train/Total loss", sums["total"] / denom, epoch)
            writer.add_scalar("Loss/train/Mid loss", sums["mid"] / denom, epoch)
            writer.add_scalar("Loss/train/First/L1 loss", sums["l1"] / denom, epoch)
            writer.add_scalar("Loss/train/Second/L1 loss", sums["l2"] / denom, epoch)
            writer.add_scalar("Loss/train/Third/L1 loss", sums["l3"] / denom, epoch)
            start = time.time()
            sums = dict(total=0.0, mid=0.0, l1=0.0, l2=0.0, l3=0.0, steps=0.0)

    if pending_save is not None:
        pending_save.wait()
    writer.close()


if __name__ == "__main__":
    main()
