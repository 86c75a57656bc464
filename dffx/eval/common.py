"""Shared eval utilities: checkpoint autoload, jet colormap, timed jitted forward."""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from dffx import checkpoint as ckpt
from dffx.models import Ctx, init_params
from dffx.models.layers import SpecTable


def load_params_auto(path: Optional[str], specs: SpecTable, *, allow_random: bool = False):
    """Load params from a reference ``.pth`` or a dffx pickle; optionally fall
    back to random init (smoke tests / environments without the checkpoints,
    which are stripped from this mirror — `.MISSING_LARGE_BLOBS`)."""
    if path and os.path.exists(path):
        if path.endswith(".pth"):
            return ckpt.load_torch_checkpoint(path, specs)
        params = ckpt.load(path)
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
        return {k: jnp.asarray(v) for k, v in params.items()}
    if allow_random:
        print(f"[dffx] checkpoint {path!r} not found — using random init (--allow-random-init)")
        return init_params(specs, seed=0)
    raise FileNotFoundError(
        f"checkpoint {path!r} not found; pass --checkpoint or --allow-random-init"
    )


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """matplotlib 'jet' RGB colormap (uint8), matching the reference's
    ``cm.get_cmap('jet')(x)[..., :3]`` (`test.py:133-140`)."""
    import matplotlib

    cmap = matplotlib.colormaps["jet"]
    rgb = cmap(np.asarray(x, dtype=np.float64))[..., :3]
    return (255 * rgb).astype(np.uint8)


def save_jet(path: str, normalized: np.ndarray) -> None:
    import imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, jet_colormap(normalized), quality=100)


def spatial_pallas_default(platform: str, dtype) -> bool:
    """Measured spatial serving policy (r4, `tools/bench_shapes.py
    --spatial-model`, ONCHIP_r04.jsonl): per-shard fused Pallas+packed beats
    per-shard XLA ~1.7x at every sharded big-stack shape (Middlebury half
    75.65 vs 127.78 ms, E2E half 116.86 vs 156.9 ms), so spatial serving
    defaults to the same bf16-on-TPU fused policy as single-chip serving."""
    return platform == "tpu" and dtype == jnp.bfloat16


class TimedForward:
    """Jitted eval forward with host-side wall timing (the reference's
    ``AVG_time`` semantics: time around the forward call, `test.py:117-119`).

    ``use_pallas=None`` auto-enables the fused TPU kernels AND the packed
    (space-to-depth) tail for the bf16 serving path — both measured wins at
    eval batch sizes (fp32 stays on the XLA parity path).

    ``spatial > 1`` serves each forward over a ``(1, spatial)`` device mesh:
    params replicated, inputs sharded along H, halo exchanges inserted by
    GSPMD (SURVEY §5 spatial-parallel serving; the reference's multi-GPU
    inference analogue is ``nn.DataParallel``, `test.py:32`).
    ``spatial_pallas=None`` (default) mirrors the single-chip serving policy:
    on TPU in bf16 the fused chains stay enabled and run per-shard behind one
    explicit halo exchange (``dffx.ops.halo``) — the r4 on-chip A/B measured
    the per-shard fused path ~1.7x faster than per-shard XLA at every
    sharded big-stack shape (PARITY.md spatial policy).  ``True`` forces the
    fused path on TPU in any dtype; ``False`` forces XLA under GSPMD halos."""

    def __init__(self, apply_fn, params, *, dtype=jnp.float32, precision=None,
                 use_pallas: Optional[bool] = None, spatial: int = 1,
                 spatial_pallas: Optional[bool] = None):
        self.params = params
        self.total = 0.0
        self.count = 0
        self._put_one = None
        self._spatial_mesh = None
        if spatial > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from dffx.parallel import make_mesh

            devs = jax.devices()
            if len(devs) < spatial:
                raise ValueError(
                    f"--spatial {spatial} needs {spatial} devices, "
                    f"have {len(devs)}"
                )
            mesh = make_mesh(devs[:spatial], data=1, spatial=spatial)
            ssh = NamedSharding(mesh, P(None, None, "spatial"))
            rep = NamedSharding(mesh, P())
            self.params = jax.device_put(params, rep)
            if spatial_pallas is None:
                spatial_pallas = spatial_pallas_default(devs[0].platform, dtype)
            if spatial_pallas:
                # run the fused chains H-sharded via the one-halo shard_map
                # wrapper (dffx.ops.halo) instead of forcing XLA.
                # Needs H % (32*spatial) == 0 — stages fall back to XLA
                # per-shape otherwise (spatial_ok gates inside the model).
                self._spatial_mesh = mesh
            else:
                use_pallas = False  # forced/off-policy: XLA under GSPMD halos

            def put_one(a):
                a = jnp.asarray(a)
                if a.ndim >= 4 and a.shape[2] % spatial:
                    raise ValueError(
                        f"H={a.shape[2]} not divisible by --spatial {spatial}"
                        " (eval shapes are x32-padded, so spatial <= 32 powers"
                        " of two always divide)"
                    )
                return jax.device_put(a, ssh if a.ndim >= 4 else rep)

            self._put_one = put_one
        if use_pallas is None:
            on_tpu = jax.devices()[0].platform == "tpu"
            if self._spatial_mesh is not None:
                # --spatial-pallas is an explicit request for the fused
                # chains: honor it in any dtype on TPU (they are exact
                # reparameterizations; bf16 is where they win, but a
                # silently-inert flag would mislabel the spatial A/B)
                use_pallas = on_tpu
                if not on_tpu:
                    print("[dffx] --spatial-pallas has no effect off-TPU — "
                          "serving on the XLA path under GSPMD halos")
                    self._spatial_mesh = None
            else:
                use_pallas = on_tpu and dtype == jnp.bfloat16
        # Pallas fast paths are exact reparameterizations of the XLA path, so
        # an XLA retry is always numerically safe.  Mosaic failures surface at
        # jit-COMPILE time (first call), not at trace time — the fallback
        # therefore lives in __call__, not inside the traced function.  It
        # protects serving from compile-service hiccups and from kernels whose
        # on-chip gate hasn't run yet (ADVICE r3: the fused motion head).
        self._use_pallas = bool(use_pallas)

        spatial_mesh = self._spatial_mesh

        def make_jitted(pallas: bool):
            def fwd(p, *args):
                ctx = Ctx(train=False, compute_dtype=dtype, precision=precision,
                          use_pallas=pallas, use_packed=pallas,
                          spatial_mesh=spatial_mesh if pallas else None)
                cast = tuple(a.astype(dtype) if a.ndim >= 4 else a for a in args)
                return apply_fn(p, *cast, ctx)

            return jax.jit(fwd)

        self._make_jitted = make_jitted
        self._jitted = make_jitted(self._use_pallas)

    def put(self, *args):
        """Device-place forward inputs (async) — spatially sharded when the
        mesh is active, plain device arrays otherwise.  Shared by the direct
        call path and the batched-eval prefetch transform."""
        if self._put_one is not None:
            return tuple(self._put_one(a) for a in args)
        return tuple(jnp.asarray(a) for a in args)

    def __call__(self, *args):
        # complete the H2D copies before starting the clock — the reference
        # times the forward after `.cuda()` (`test.py:115-118`), so AVG_time
        # measures the model, not the host link
        args = jax.block_until_ready(self.put(*args))
        t0 = time.time()
        try:
            outs = self._jitted(self.params, *args)
            outs = jax.block_until_ready(outs)
        except Exception as e:
            # Mosaic/compile failures surface on the FIRST call of a shape;
            # later-call errors (OOM mid-eval, device loss) are real failures
            # that must propagate, not silently switch paths mid-measurement
            if not self._use_pallas or self.count > 0:
                raise
            import traceback

            traceback.print_exc()
            print(f"[dffx] fused Pallas path failed on the first call "
                  f"({type(e).__name__}; traceback above) — retrying on the "
                  f"XLA path")
            self._use_pallas = False
            self._jitted = self._make_jitted(False)
            t0 = time.time()
            outs = jax.block_until_ready(self._jitted(self.params, *args))
        self.total += time.time() - t0
        # count samples, not calls: with batched eval AVG_time stays the
        # per-sample average the reference prints (`test.py:117-119,:181`)
        self.count += int(args[0].shape[0]) if args and args[0].ndim >= 4 else 1
        return outs

    @property
    def avg_time(self) -> float:
        return self.total / max(self.count, 1)
