"""Host input-pipeline throughput: can the loader feed the chip?

Synthesizes realistic-size on-disk datasets under /tmp and measures the
threaded ``dffx.data.Loader`` end-to-end (decode + augment + collate) in
stacks/s, host-only — no TPU needed.  The number to beat is the chip-side
training rate (182 stacks/s at b128 224² bf16, `tools/bench_train.py`): the
loader must sustain more than that or training becomes input-bound.

Two workloads (the two training families with heavyweight decode):
  * ddff        — h5 focal stacks (10×383×552 uint8) + ddff train augmentation,
                  the flagship DDFF-12 recipe (`train_codes/train_code_DDFF.py:69`)
  * smartphone  — 10 JPEGs (504×378) through the csrc libjpeg path + depth PNG
                  + confidence EXR + augmentation
                  (`train_codes/train_code_smartphone.py` loader)

Usage: python tools/bench_loader.py [--threads N] [--batch B] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ROOT = "/tmp/dffx_loader_bench"


def _synth_ddff(path: str, scenes: int = 24) -> None:
    import h5py

    if os.path.exists(path):
        return
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        # trainval layout: uint8 stacks, float32 disparity (datasets.py:229-233)
        f.create_dataset(
            "stack_train",
            data=rng.integers(0, 256, (scenes, 10, 383, 552, 3), dtype=np.uint8),
        )
        f.create_dataset(
            "disp_train",
            data=rng.uniform(0.0202, 0.28, (scenes, 383, 552)).astype(np.float32),
        )


def _synth_smartphone(root: str, scenes: int = 12) -> None:
    import cv2

    from dffx.data import exr

    if os.path.exists(os.path.join(root, "train1")):
        return
    rng = np.random.default_rng(0)
    h, w = 504, 378  # the real center-scaled image size
    for s in range(scenes):
        # the loader scans shards train1..train7 (datasets.py:289)
        base = os.path.join(root, f"train{s % 7 + 1}")
        scene = f"scene{s:02d}"
        for j in range(49):
            d = os.path.join(base, "scaled_images", scene, str(j))
            os.makedirs(d, exist_ok=True)
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(
                os.path.join(d, "result_scaled_image_center.jpg"),
                img,
                [cv2.IMWRITE_JPEG_QUALITY, 90],
            )
        dd = os.path.join(base, "merged_depth", scene)
        os.makedirs(dd, exist_ok=True)
        cv2.imwrite(
            os.path.join(dd, "result_merged_depth_center.png"),
            rng.integers(30, 220, (h, w), dtype=np.uint8),
        )
        cd = os.path.join(base, "merged_conf", scene)
        os.makedirs(cd, exist_ok=True)
        conf = rng.uniform(0, 1.2, (h, w)).astype(np.float32)
        exr.write(
            os.path.join(cd, "result_merged_conf_center.exr"),
            {"R": conf, "G": conf, "B": conf},
        )


def _run(loader, epochs: int) -> float:
    for _ in loader:  # one warm epoch: thread pool + page cache
        pass
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += batch["fs"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--cleanup", action="store_true",
                    help="delete the synthetic fixtures at exit (default: keep "
                         "them under /tmp so repeat runs skip the synthesis)")
    args = ap.parse_args()

    from dffx.data import DDFFTrainval, Loader, SmartphoneDataset

    os.makedirs(BENCH_ROOT, exist_ok=True)
    out = {"threads": args.threads, "batch": args.batch}

    h5 = os.path.join(BENCH_ROOT, "ddff-trainval-synth.h5")
    _synth_ddff(h5)
    ds = DDFFTrainval(h5_path=h5, split="train")
    ld = Loader(ds, batch_size=args.batch, shuffle=True, drop_last=True,
                num_threads=args.threads)
    out["ddff_train_stacks_per_sec"] = round(_run(ld, args.epochs), 2)

    sp_root = os.path.join(BENCH_ROOT, "smartphone") + "/"
    _synth_smartphone(sp_root)
    ds = SmartphoneDataset(root=sp_root, mode="train")
    ld = Loader(ds, batch_size=args.batch, shuffle=True, drop_last=True,
                num_threads=args.threads)
    out["smartphone_train_stacks_per_sec"] = round(_run(ld, args.epochs), 2)

    print(json.dumps(out))
    if args.cleanup:
        shutil.rmtree(BENCH_ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
