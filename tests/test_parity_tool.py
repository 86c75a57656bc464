"""End-to-end test of the parity-day kit (`tools/parity_ddff.py`).

The tool is the ONE command to run the day the stripped pretrained blobs
arrive (VERDICT r4 item 7) — so it must be proven to work BEFORE that day,
on synthetic stand-ins for both blobs:

- checkpoint: the reference test-side ``Network`` at random init, saved in
  the `module.`-prefixed DataParallel flavor (the harder of the two save
  flavors the tool must unwrap, `train_code_HCI.py:64`);
- dataset: a tiny h5 with the real key (``stack_test``) and layout
  ``(n, 10, H, W, 3)`` uint8-range floats, at a small odd spatial size so the
  pad-to-%32 / crop-back path is exercised (63x88 -> 64x96 -> 63x88).

The tool runs as a real subprocess (its CLI, env contract, JSON verdict) on
the CPU backend — exactly how it will run on parity day.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_NET = "/root/reference/Depth_Estimation_Test/Depth_Estimation_Network.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_NET), reason="read-only reference checkout unavailable"
)


def test_parity_ddff_tool_end_to_end(tmp_path):
    sys.path.insert(0, os.path.dirname(REF_NET))
    try:
        from Depth_Estimation_Network import Network  # reference, read-only
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    model = Network().eval()
    ckpt = tmp_path / "check_point.pth"
    torch.save({f"module.{k}": v for k, v in model.state_dict().items()}, ckpt)

    rng = np.random.default_rng(0)
    h5 = tmp_path / "ddff-dataset-test.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset(
            "stack_test",
            data=rng.uniform(0, 255, (2, 10, 63, 88, 3)).astype(np.float32),
        )

    env = dict(os.environ)
    env["DFFX_DDFF_CKPT"] = str(ckpt)
    env["DFFX_DDFF_H5"] = str(h5)
    # parity day may find the TPU tunnel in any state — the documented
    # fallback is the CPU backend with `.axon_site` stripped (CLAUDE.md rule)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon_site" not in p and p != REPO]
    )

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_ddff.py"),
         "--limit", "2", "--all-heads"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["ddff_parity"] == "pass", verdict
    assert verdict["stacks"] == 2
    # same random weights on both sides: the rel-MSE should be numerics-level,
    # far inside the 1% gate — a layout/conversion bug would blow this up
    assert verdict["worst_rel_mse"] < 1e-4, verdict
    assert set(verdict["per_head_rel_mse"]) == {"mid", "pred1", "pred2", "pred3"}
    # the per-stack progress lines (stderr) prove the loop actually ran
    assert proc.stderr.count("rel_mse") >= 2
