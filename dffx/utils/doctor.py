"""``dffx doctor`` — one-screen environment report for the framework.

The reference system has no equivalent; users diagnose a broken install by
reading torch stack traces.  Here one command answers the questions that
actually gate each subsystem: which XLA backend will compute, whether the
native host-IO library (csrc/libdffxio.so) is built/buildable, which optional
data deps are importable, and whether the pure-python EXR codec round-trips.

Checks are import-light and CPU-safe: nothing here compiles a model or touches
a TPU beyond ``jax.devices()`` (which is how the user finds out what backend
they are on in the first place).  Exit code is 0 when every *core* row is
healthy; optional rows (cv2, h5py, ...) only warn — every loader path has a
documented fallback or a clear error at use time.
"""

from __future__ import annotations

import platform
import sys
from typing import List, Tuple

OK, WARN, FAIL = "ok", "warn", "FAIL"


def _row(name: str, status: str, detail: str) -> Tuple[str, str, str]:
    return (name, status, detail)


def collect() -> List[Tuple[str, str, str]]:
    """Run every check; returns (name, status, detail) rows."""
    rows: List[Tuple[str, str, str]] = []

    import dffx

    rows.append(_row("dffx", OK, f"{dffx.__version__} ({sys.prefix})"))
    rows.append(_row("python", OK, f"{platform.python_version()} on {platform.machine()}"))

    # --- core: jax backend ------------------------------------------------
    try:
        import jax

        devs = jax.devices()
        kinds = sorted({d.platform for d in devs})
        rows.append(_row(
            "jax", OK,
            f"{jax.__version__}, {len(devs)} device(s) [{', '.join(kinds)}]: "
            + ", ".join(d.device_kind for d in devs[:4])
            + (" ..." if len(devs) > 4 else ""),
        ))
    except Exception as e:  # pragma: no cover - depends on broken installs
        rows.append(_row("jax", FAIL, f"backend init failed: {e}"))

    for mod in ("optax", "numpy"):
        try:
            m = __import__(mod)
            rows.append(_row(mod, OK, getattr(m, "__version__", "?")))
        except Exception as e:  # pragma: no cover
            rows.append(_row(mod, FAIL, str(e)))

    # --- core: native host-IO library -------------------------------------
    try:
        from dffx.data import native

        if native.available():
            import ctypes

            lib = ctypes.CDLL(native._SO)
            lib.dffxio_version.restype = ctypes.c_int
            rows.append(_row("csrc/libdffxio", OK,
                             f"built (abi v{lib.dffxio_version()}): fused decode+normalize+pad"))
        else:
            rows.append(_row("csrc/libdffxio", WARN,
                             "not built and `make -C csrc` failed — loader falls back to numpy/cv2"))
    except Exception as e:  # pragma: no cover
        rows.append(_row("csrc/libdffxio", WARN, f"probe failed: {e}"))

    # --- core: EXR codec round-trip ----------------------------------------
    try:
        import os
        import tempfile

        import numpy as np

        from dffx.data import exr

        img = (np.arange(12, dtype=np.float32).reshape(3, 4) / 7.0).astype(np.float16)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "probe.exr")
            exr.write(p, {"R": img})
            back = exr.read(p)["R"]
        if np.array_equal(back.astype(np.float16), img):
            rows.append(_row("exr codec", OK, "fp16 round-trip exact"))
        else:  # pragma: no cover
            rows.append(_row("exr codec", FAIL, "round-trip mismatch"))
    except Exception as e:  # pragma: no cover
        rows.append(_row("exr codec", FAIL, str(e)))

    # --- optional data deps -------------------------------------------------
    for mod, why in (
        ("h5py", "DDFF-12 .h5 focal stacks"),
        ("cv2", "simulator/eval image writers (loader reads are native)"),
        ("scipy", "NYU .mat ingest for the simulator"),
        ("torch", "checkpoint conversion oracle + parity tests"),
    ):
        try:
            m = __import__(mod)
            rows.append(_row(mod, OK, getattr(m, "__version__", "?")))
        except Exception:
            rows.append(_row(mod, WARN, f"not importable — needed only for: {why}"))

    return rows


def main(argv=None) -> int:
    rows = collect()
    width = max(len(n) for n, _, _ in rows)
    worst = 0
    for name, status, detail in rows:
        print(f"  {name:<{width}}  [{status:^4}]  {detail}")
        if status == FAIL:
            worst = 1
    print("doctor:", "environment healthy" if worst == 0 else "CORE CHECKS FAILED")
    return worst


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
