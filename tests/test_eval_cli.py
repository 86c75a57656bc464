"""End-to-end eval CLI tests on synthetic fixtures (CPU): dataset dispatch,
metric prints, and output files — the reference's operational 'test harness'
(SURVEY.md §4), actually automated."""

import os

import numpy as np
import pytest

from dffx.data import exr

REF_SCENES = "/root/reference/End_to_End/Datasets"


@pytest.fixture(scope="module")
def fs6_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("cli_ds")
    test = root / "fs_6" / "test"
    test.mkdir(parents=True)
    r = np.random.default_rng(0)
    for s in range(2):
        exr.write(
            str(test / f"{s:02d}Dpt.exr"),
            {c: r.uniform(0.0, 1.8, (64, 64)).astype(np.float16) for c in "RGB"},
        )
        for i in range(5):
            cv2.imwrite(
                str(test / f"{s:02d}_{i}All.tif"),
                r.integers(0, 256, (64, 64, 3), dtype=np.uint8),
            )
    return str(root)


def test_eval_cli_defocusnet(fs6_root, tmp_path, capsys):
    from dffx.eval import test as T

    results = str(tmp_path / "results") + "/"
    T.main(
        [
            "--dataset", "DefocusNet",
            "--data-root", fs6_root + "/",
            "--results-root", results,
            "--allow-random-init",
        ]
    )
    out = capsys.readouterr().out
    for key in ["Avg_abs_rel", "Avg_mse", "Avg_rmse_log", "Avg_accuracy_3", "AVG_time"]:
        assert key in out, out
    jpgs = os.listdir(os.path.join(results, "DefocusNet", "Depth"))
    assert sorted(jpgs) == ["0.jpg", "1.jpg"]


def _parse_metrics(out: str) -> dict:
    vals = {}
    for line in out.splitlines():
        if ":" in line and line.split(":")[0].strip().startswith(("Avg_", "AVG_")):
            key, v = line.split(":", 1)
            try:
                vals[key.strip()] = float(v)
            except ValueError:
                pass
    return vals


def test_eval_cli_batched_matches_batch1(fs6_root, tmp_path, capsys):
    """--batch_size N must print the same metrics as the reference's
    sample-at-a-time loop (batched eval is a pure throughput change)."""
    from dffx.eval import test as T

    outs = []
    for bs in ("1", "2"):
        T.main([
            "--dataset", "DefocusNet",
            "--data-root", fs6_root + "/",
            "--results-root", str(tmp_path / f"results_b{bs}") + "/",
            "--allow-random-init",
            "--batch_size", bs,
        ])
        outs.append(_parse_metrics(capsys.readouterr().out))
    m1, m2 = outs
    keys = [k for k in m1 if k != "AVG_time"]
    assert keys and set(keys) == set(k for k in m2 if k != "AVG_time")
    for k in keys:
        np.testing.assert_allclose(m2[k], m1[k], rtol=1e-5, err_msg=k)


def test_eval_cli_spatial_matches_single_device(fs6_root, tmp_path, capsys):
    """--spatial N (H sharded over a (1,N) mesh, params replicated, GSPMD
    halos) must print the same metrics as the single-device path — the
    multi-chip serving story of SURVEY §5, reachable from the CLI."""
    from dffx.eval import test as T

    outs = []
    for spatial in ("1", "2"):
        T.main([
            "--dataset", "DefocusNet",
            "--data-root", fs6_root + "/",
            "--results-root", str(tmp_path / f"results_s{spatial}") + "/",
            "--allow-random-init",
            "--batch_size", "2",
            "--spatial", spatial,
        ])
        outs.append(_parse_metrics(capsys.readouterr().out))
    m1, m2 = outs
    keys = [k for k in m1 if k != "AVG_time"]
    assert keys and set(keys) == set(k for k in m2 if k != "AVG_time")
    for k in keys:
        np.testing.assert_allclose(m2[k], m1[k], rtol=1e-5, err_msg=k)


@pytest.mark.skipif(not os.path.isdir(REF_SCENES), reason="no bundled scene")
def test_real_scenes_cli(tmp_path, capsys, monkeypatch):
    """Alignment + depth CLI on a shrunken copy of the bundled balls scene
    (full-res on CPU is too slow for a unit test)."""
    import cv2

    from dffx.eval import real_scenes as RS

    src = os.path.join(REF_SCENES, "balls")
    scene = tmp_path / "scenes" / "balls"
    scene.mkdir(parents=True)
    files = sorted(f for f in os.listdir(src) if f.endswith("jpg"))[:10]
    for f in files:
        img = cv2.imread(os.path.join(src, f))
        cv2.imwrite(str(scene / f), cv2.resize(img, (120, 72)))
    for t in ("focus_distance.txt", "focal_length.txt"):
        (scene / t).write_text(open(os.path.join(src, t)).read())

    out_dir = str(tmp_path / "out") + "/"
    RS.main(
        [
            "--data-root", str(tmp_path / "scenes"),
            "--out", out_dir,
            "--allow-random-init",
        ]
    )
    assert os.path.exists(os.path.join(out_dir, "depth", "0.jpg"))
    warped = os.listdir(os.path.join(out_dir, "warped_result", "0"))
    assert len(warped) == 10
    assert "AVG_time" in capsys.readouterr().out

    # spatial serving flags plumb through (exactness is pinned by
    # tests/test_spatial_pallas.py; this is the CLI path on the CPU mesh)
    out_sp = str(tmp_path / "out_sp") + "/"
    RS.main(
        [
            "--data-root", str(tmp_path / "scenes"),
            "--out", out_sp,
            "--allow-random-init",
            "--spatial", "2",
            "--spatial-pallas",
        ]
    )
    assert os.path.exists(os.path.join(out_sp, "depth", "0.jpg"))
    assert "AVG_time" in capsys.readouterr().out


def test_timed_forward_pallas_compile_fallback():
    """A fused-path compile failure at first call must fall back to the XLA
    path transparently (ADVICE r3: serving has no runtime fallback)."""
    import jax.numpy as jnp

    from dffx.eval.common import TimedForward

    calls = []

    def apply_fn(params, x, ctx):
        calls.append(ctx.use_pallas)
        if ctx.use_pallas:
            raise RuntimeError("Mosaic compile service: INTERNAL")
        return (x * params,)

    fwd = TimedForward(apply_fn, jnp.asarray(2.0), use_pallas=True)
    x = jnp.ones((1, 2, 32, 32, 3))
    (out,) = fwd(x)
    assert calls == [True, False]
    assert float(out[0, 0, 0, 0, 0]) == 2.0
    assert fwd.count == 1
    # subsequent calls stay on the XLA path without re-failing
    fwd(x)
    assert calls == [True, False]  # cached jit, no retrace
    assert fwd.count == 2


def test_timed_forward_later_call_errors_propagate():
    """The XLA-retry fallback is for FIRST-call compile failures only: an
    error on a later call (OOM mid-eval, device loss) must propagate, not
    silently switch serving paths mid-measurement."""
    import jax.numpy as jnp

    from dffx.eval.common import TimedForward

    state = {"fail": False}

    def apply_fn(params, x, ctx):
        if state["fail"]:
            raise RuntimeError("RESOURCE_EXHAUSTED: hbm")
        return (x * params,)

    fwd = TimedForward(apply_fn, jnp.asarray(2.0), use_pallas=True)
    x = jnp.ones((1, 2, 32, 32, 3))
    fwd(x)
    assert fwd._use_pallas is True
    state["fail"] = True
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        fwd(jnp.ones((1, 2, 64, 32, 3)))  # new shape -> retrace -> error
    assert fwd._use_pallas is True  # no silent path switch


def test_spatial_pallas_flag_not_silently_inert(capsys):
    """--spatial-pallas with use_pallas unresolved (None) must be honored on
    the device platform regardless of dtype, and must WARN + drop the mesh
    off-TPU — never silently measure the XLA path under a 'pallas' label."""
    import jax.numpy as jnp

    from dffx.eval.common import TimedForward
    from dffx.models import dffnet_apply, init_params, network_specs

    params = init_params(network_specs(), seed=0)
    fwd = TimedForward(dffnet_apply, params, dtype=jnp.float32, spatial=2,
                       spatial_pallas=True)  # use_pallas=None, CPU platform
    assert fwd._spatial_mesh is None
    assert fwd._use_pallas is False
    assert "--spatial-pallas has no effect off-TPU" in capsys.readouterr().out


def test_spatial_pallas_default_policy(capsys):
    """spatial_pallas=None mirrors the single-chip auto policy (r4 measured:
    per-shard fused beats per-shard XLA ~1.7x, so bf16-on-TPU => fused) and
    resolves quietly — the off-TPU warning is reserved for an explicit
    --spatial-pallas request."""
    import jax.numpy as jnp

    from dffx.eval.common import TimedForward, spatial_pallas_default
    from dffx.models import dffnet_apply, init_params, network_specs

    assert spatial_pallas_default("tpu", jnp.bfloat16) is True
    assert spatial_pallas_default("tpu", jnp.float32) is False
    assert spatial_pallas_default("cpu", jnp.bfloat16) is False

    params = init_params(network_specs(), seed=0)
    # CPU platform: auto resolves to the XLA path with no warning
    fwd = TimedForward(dffnet_apply, params, dtype=jnp.bfloat16, spatial=2)
    assert fwd._spatial_mesh is None
    assert fwd._use_pallas is False
    assert "--spatial-pallas" not in capsys.readouterr().out
    # explicit False forces XLA in any dtype, also quietly
    fwd = TimedForward(dffnet_apply, params, dtype=jnp.bfloat16, spatial=2,
                       spatial_pallas=False)
    assert fwd._spatial_mesh is None
    assert fwd._use_pallas is False


def test_eval_cli_spatial_flags_mutually_exclusive(capsys):
    import pytest

    from dffx.eval import test as eval_test

    with pytest.raises(SystemExit):
        eval_test.main(["--dataset", "DefocusNet", "--spatial", "2",
                        "--spatial-pallas", "--spatial-xla"])
    assert "mutually exclusive" in capsys.readouterr().err
