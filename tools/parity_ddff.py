"""Parity-day runner: DDFF-12 <1% rel-MSE verdict against `check_point.pth`.

The north-star accuracy criterion (BASELINE.json: "DDFF-12 test MSE within 1%
of check_point.pth") is externally blocked — the pretrained blobs are stripped
from this mirror (`/root/reference/.MISSING_LARGE_BLOBS`).  This tool is the
ONE command to run the day they arrive (VERDICT r4 item 7):

    DFFX_DDFF_CKPT=/path/check_point.pth \
    DFFX_DDFF_H5=/path/ddff-dataset-test.h5 \
    python tools/parity_ddff.py [--limit N] [--all-heads]

What it does, mirroring the reference eval loop exactly
(`/root/reference/Depth_Estimation_Test/test.py:77-130`):

1. converts the torch state_dict (either save flavor) with
   `dffx.checkpoint.load_torch_checkpoint`;
2. loads the 120 `stack_test` stacks, `/127.5-1`, pads 383x552 -> 384x576
   with -1 (`test_Dataloader.py:103-140` semantics via dffx's own loader
   constants);
3. runs the torch reference net (CPU, fp32, batch 1 — the reference's own
   DataLoader config, `test.py:82`) as the oracle and `dffnet_apply` (fp32,
   `precision="highest"`, batch 1) side by side, crops both back to 383x552
   (`test.py:124-125`);
4. prints a per-stack and aggregate relative-MSE table and ONE JSON verdict
   line: `{"ddff_parity": "pass"|"fail", "rel_mse": ..., "stacks": N}`.

Expected runtime: the torch-CPU forward is ~4.3 s/stack on this VM
(.bench_cpu_baseline.json) and ours ~1 s, so the full 120-stack run is
~12-15 min; `--limit 10` gives a ~80 s smoke verdict.  Runs fine with the
TPU tunnel down (`JAX_PLATFORMS=cpu` recommended then: strip `.axon_site`
from PYTHONPATH so the CPU platform wins).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0,
                    help="only the first N stacks (0 = all 120)")
    ap.add_argument("--all-heads", action="store_true",
                    help="gate mid/pred1/pred2 too, not just the final pred3")
    args = ap.parse_args()

    ckpt = os.environ.get("DFFX_DDFF_CKPT")
    h5 = os.environ.get("DFFX_DDFF_H5")
    if not (ckpt and os.path.exists(ckpt)):
        print("DFFX_DDFF_CKPT is unset or missing — supply the pretrained "
              "Results_test/DDFF/check_point.pth (stripped from this mirror, "
              "see /root/reference/.MISSING_LARGE_BLOBS)", file=sys.stderr)
        return 2
    if not (h5 and os.path.exists(h5)):
        print("DFFX_DDFF_H5 is unset or missing — supply "
              "ddff-dataset-test.h5 (key 'stack_test')", file=sys.stderr)
        return 2

    import h5py
    import torch

    import jax.numpy as jnp

    from dffx import checkpoint
    from dffx.data.datasets import ddff_focus_dists
    from dffx.models import Ctx, dffnet_apply, network_specs

    ref_dir = "/root/reference/Depth_Estimation_Test"
    sys.path.insert(0, ref_dir)
    from Depth_Estimation_Network import Network  # reference, read-only

    model = Network().eval()
    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    # both reference save flavors load: plain (train_code_DDFF.py:79) and
    # `module.`-prefixed DataParallel (train_code_HCI.py:64)
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    model.load_state_dict(sd)
    params = checkpoint.load_torch_checkpoint(ckpt, network_specs())

    fd = ddff_focus_dists()  # (10,) — test.py:50-58 camera constants
    ctx = Ctx(precision="highest")  # fp32 parity mode

    with h5py.File(h5, "r") as f:
        n_stacks = f["stack_test"].shape[0]
        if args.limit:
            n_stacks = min(args.limit, n_stacks)
        rels = []
        head_rels: dict = {}
        for i in range(n_stacks):
            raw = np.asarray(f["stack_test"][i], dtype=np.float32)  # (10,383,552,3)
            fs = raw / 127.5 - 1.0
            oh, ow = fs.shape[1], fs.shape[2]
            ph, pw = (32 - oh % 32) % 32, (32 - ow % 32) % 32
            fs = np.pad(fs, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=-1.0)
            hh, ww = fs.shape[1:3]
            with torch.no_grad():
                fd_t = torch.from_numpy(
                    np.tile(fd[None, :, None, None], (1, 1, hh, ww)))
                ref_outs = model(
                    torch.from_numpy(fs.transpose(3, 0, 1, 2)[None]), fd_t)
            got_outs = dffnet_apply(params, jnp.asarray(fs[None]),
                                    jnp.asarray(fd[None]), ctx)
            heads = range(4) if args.all_heads else [3]
            for hd in heads:
                ref = ref_outs[hd].numpy().squeeze(0)[:oh, :ow]
                got = np.asarray(got_outs[hd])[0][:oh, :ow]
                mse = float(np.mean((got - ref) ** 2))
                rel = mse / max(float(np.mean(ref ** 2)), 1e-12)
                head_rels.setdefault(hd, []).append(rel)
                if hd == 3:
                    rels.append(rel)
            print(f"stack {i:3d}: rel_mse {rels[-1]:.3e}", file=sys.stderr,
                  flush=True)

    agg = float(np.mean(rels))
    worst = float(np.max(rels))
    verdict = "pass" if worst < 0.01 else "fail"
    rec = {"ddff_parity": verdict, "rel_mse": agg, "worst_rel_mse": worst,
           "stacks": len(rels)}
    if args.all_heads:
        rec["per_head_rel_mse"] = {
            ["mid", "pred1", "pred2", "pred3"][h]: float(np.mean(v))
            for h, v in sorted(head_rels.items())}
    print(json.dumps(rec))
    return 0 if verdict == "pass" else 1


if __name__ == "__main__":
    sys.exit(main())
