"""Thin-lens defocus simulator: manufacture "in the wild" focal stacks (with
focus breathing + hand shake) from RGB-D images.

Rebuilds `Simulator/synthetic_blur_movement.py` with the same optics
(thin-lens ``lens_to_sensor = f*d/(d-f)``, per-device FOV-vs-diopter error
lines, Gaussian translation jitter, disc circle-of-confusion PSFs, equal-CoC
depth-plane merging, back-to-front binary compositing) but TPU-native
execution and the committed bugs fixed:

* the unconditional ``exit()`` after the first scene (`:278`) is gone — the
  CLI renders the whole dataset;
* the per-layer ``cv2.filter2D`` host loop (`:262-264`) becomes ONE batched
  XLA convolution over all CoC layers (layers as output channels), jit-cached
  by (H, W, K, kmax) buckets;
* the warp uses the same separable interpolation matmuls as the model
  (`dffx.ops.affine_warp_stack` machinery) instead of torch ``grid_sample``.

Dataset layout and the ``depth.mat``/``camera_param.mat`` sidecars are
unchanged, with NYU-v2 read through h5py (v7.3 .mat) instead of mat73.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import List, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Device profiles (measured FOV-error lines + shake stats; `:121-168`)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DeviceProfile:
    name: str
    native_width: int  # sensor pixel width the shake stats were measured at
    alpha_slope: float
    y_intercept: float
    beta_mean: float
    beta_var: float
    gamma_mean: float
    gamma_var: float
    focal_length: float  # meters
    f_num: float


DEVICE_PROFILES: Tuple[DeviceProfile, ...] = (
    DeviceProfile("pixel4_XL", 4032, -0.00266, 0.019155, -4.45515, 7.18485,
                  -9.9504701, 8.04556863, 0.0044, 1.7),
    DeviceProfile("pixel6", 4080, -0.00429249, 0.00330253, 0.470281, 6.2634662,
                  2.69174424, 6.859772247, 0.0068, 1.9),
    DeviceProfile("galaxy_S8+", 4032, -0.00203839, 0.0166955, 4.430173117,
                  4.60067699, 3.695449964, 3.589144555, 0.0043, 1.5),
    DeviceProfile("galaxy_note10", 4032, -0.00402384, 0.0247385, -4.315575939,
                  2.9198626, -0.9456601, 0.153538997, 0.0048, 1.7),
)


# ---------------------------------------------------------------------------
# Geometry: 2D scale-about-center + translate warp (separable matmuls)
# ---------------------------------------------------------------------------


_WARP_CACHE = {}


def _warp_jitted():
    import jax

    if "fn" not in _WARP_CACHE:
        from dffx.ops import affine_warp_stack

        def impl(x, fov, beta, gamma):
            out, _ = affine_warp_stack(x, fov, beta, gamma)
            return out

        _WARP_CACHE["fn"] = jax.jit(impl)
    return _WARP_CACHE["fn"]


def warp_2d(img: np.ndarray, fov: float, beta: float, gamma: float) -> np.ndarray:
    """The simulator's warp (`:15-71`): sampling offset
    ``flow_x = (W//2)*(fov-1)*linspace(-1,1,W) - beta`` (note the minus — the
    simulator's sign convention differs from the model's), bilinear
    align_corners=True with zeros padding.  Accepts (H, W) or (H, W, C).

    One module-level jitted program (compile cache keyed by shape; motion
    parameters are traced operands so new values never recompile)."""
    import jax.numpy as jnp

    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    x = jnp.asarray(x[None, None].astype(np.float32))  # (1, 1, H, W, C)
    out = _warp_jitted()(
        x,
        jnp.full((1, 1), fov, jnp.float32),
        jnp.full((1, 1), -beta, jnp.float32),
        jnp.full((1, 1), -gamma, jnp.float32),
    )
    out = np.asarray(out)[0, 0]
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------------------
# Circle-of-confusion machinery
# ---------------------------------------------------------------------------


_DISC_CACHE = {}


def disc_kernel(blur_size: int) -> np.ndarray:
    """Normalized disc PSF, identical to ``create_blur`` (`:81-87`):
    cv2.circle(radius=blur_size//2, filled) on a blur_size^2 canvas.
    Memoized — a scene calls this hundreds of times over ~30 distinct sizes."""
    cached = _DISC_CACHE.get(blur_size)
    if cached is None:
        import cv2

        canvas = np.zeros((blur_size, blur_size), dtype=np.float64)
        cv2.circle(canvas, (blur_size // 2, blur_size // 2), blur_size // 2,
                   (1, 1, 1), -1)
        kern = canvas / np.sum(canvas)
        kern.setflags(write=False)  # shared across callers — freeze it
        cached = _DISC_CACHE.setdefault(blur_size, kern)
    return cached


def coc_layers(
    coc_scale: float,
    focus_dist: float,
    min_scene_depth: float,
    max_scene_depth: float,
    num_planes: int,
) -> List[Tuple[int, float, float]]:
    """Merge ``num_planes`` uniform depth planes into runs of equal integer CoC
    (`:230-245`).  Returns [(coc_size, min_dis, max_dis)] with the last run's
    max extended by 0.1 (the reference's last-iteration fudge)."""
    out: List[Tuple[int, float, float]] = []
    span = max_scene_depth - min_scene_depth
    for k in range(num_planes):
        min_dis = k / num_planes * span + min_scene_depth
        max_dis = (k + 1) / num_planes * span + min_scene_depth
        sub_dis = min_dis + (max_dis - min_dis) / 2
        # python round() on a numpy double = round-half-to-even
        coc_size = int(np.rint(coc_scale * (sub_dis - focus_dist) / sub_dis))
        if k > 0 and max_dis == max_scene_depth:
            max_dis += 0.1
        if out and out[-1][0] == coc_size:
            out[-1] = (out[-1][0], out[-1][1], max_dis)
        else:
            out.append((coc_size, min_dis, max_dis))
    return out


def _bucket(n: int) -> int:
    """Round up to a small set of sizes so the jitted conv cache stays small."""
    for b in (1, 2, 4, 8, 16, 32, 64, 128):
        if n <= b:
            return b
    return n


def _bucket_odd(n: int) -> int:
    """Kernel-size bucket: must stay odd so 'same' padding is symmetric."""
    for b in (1, 3, 5, 9, 17, 33, 65, 129):
        if n <= b:
            return b
    return n if n % 2 else n + 1


def _blur_all_impl(img_chw, kern):
    """(3, H, W, 1) conv (kmax, kmax, 1, K) -> (3, H, W, K); REFLECT_101 pad
    matches cv2.filter2D's default border.  Module-level and jitted ONCE so the
    compile cache persists across slices/scenes (keyed by shapes/buckets)."""
    import jax.numpy as jnp
    from jax import lax

    p = kern.shape[0] // 2
    padded = jnp.pad(img_chw, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return lax.conv_general_dilated(
        padded, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


_BLUR_ALL_CACHE = {}


def _blur_all(img_chw, kern):
    import jax

    if "fn" not in _BLUR_ALL_CACHE:
        _BLUR_ALL_CACHE["fn"] = jax.jit(_blur_all_impl)
    return _BLUR_ALL_CACHE["fn"](img_chw, kern)


def _slice_program_impl(image, depth, depth_px, fov, beta, gamma,
                        kernels, bounds, coc_scale, fd_px):
    """Whole per-slice pipeline as ONE device program: warp image + depth,
    thin-lens disparity, per-CoC-layer disc blur and back-to-front composite.

    image (H, W, 3) float 0..255; depth (H, W) meters (mask source, unwarped);
    depth_px (H, W) pixels; kernels (K, kmax, kmax) zero-padded discs;
    bounds (K, 2) layer depth ranges ([inf, inf] rows are inactive padding).
    Returns (composited (H, W, 3) float, disparity (H, W) float32).
    """
    import jax.numpy as jnp
    from jax import lax

    from dffx.ops import affine_warp_stack

    h, w, _ = image.shape
    stack = jnp.concatenate([image, depth_px[..., None]], axis=-1)[None, None]
    warped, _ = affine_warp_stack(
        stack,
        fov.reshape(1, 1), (-beta).reshape(1, 1), (-gamma).reshape(1, 1),
    )
    warped = warped[0, 0]
    wimg = jnp.floor(jnp.clip(warped[..., :3], 0.0, 255.0))  # uint8 truncation
    wdepth_px = warped[..., 3]
    disparity = jnp.abs(coc_scale * (wdepth_px - fd_px) / wdepth_px)

    p = kernels.shape[1] // 2
    padded = jnp.pad(wimg[None], ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")

    # blur all 3 channels with each layer's kernel in a scan — the whole loop
    # is a single XLA program, no host round-trips per layer.
    def step(carry, inputs):
        kern, lo, hi = inputs
        kern4 = jnp.broadcast_to(kern[..., None, None], kern.shape + (1, 1))
        blur = lax.conv_general_dilated(
            padded.transpose(3, 1, 2, 0),  # (3, Hp, Wp, 1)
            kern4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[..., 0].transpose(1, 2, 0)  # (H, W, 3)
        blur = jnp.clip(jnp.round(blur), 0.0, 255.0)
        mask = ((depth >= lo) & (depth < hi)).astype(blur.dtype)
        return carry + blur * mask[..., None], None

    out0 = jnp.zeros((h, w, 3), jnp.float32)
    out, _ = lax.scan(step, out0, (kernels, bounds[:, 0], bounds[:, 1]))
    return out, disparity.astype(jnp.float32)


_SLICE_PROGRAM = {}


def _slice_program(*args):
    import jax

    if "fn" not in _SLICE_PROGRAM:
        _SLICE_PROGRAM["fn"] = jax.jit(_slice_program_impl)
    return _SLICE_PROGRAM["fn"](*args)


def render_slice_fused(image, depth, depth_px, fov, beta, gamma, layers,
                       coc_scale, fd_px):
    """Host wrapper for the fused per-slice device program."""
    import jax.numpy as jnp

    ksizes = [2 * abs(k if k != 0 else 1) + 1 for k, _, _ in layers]
    kmax = _bucket_odd(max(ksizes))
    n_layers = _bucket(len(layers))
    kernels = np.zeros((n_layers, kmax, kmax), dtype=np.float32)
    bounds = np.full((n_layers, 2), np.inf, dtype=np.float32)
    for i, ((_, lo, hi), ks) in enumerate(zip(layers, ksizes)):
        pad = (kmax - ks) // 2
        kernels[i, pad : pad + ks, pad : pad + ks] = disc_kernel(ks)
        bounds[i] = (lo, hi)
    out, disparity = _slice_program(
        jnp.asarray(image.astype(np.float32)),
        jnp.asarray(depth.astype(np.float32)),
        jnp.asarray(depth_px.astype(np.float32)),
        jnp.float32(fov), jnp.float32(beta), jnp.float32(gamma),
        jnp.asarray(kernels), jnp.asarray(bounds),
        jnp.float32(coc_scale), jnp.float32(fd_px),
    )
    return np.asarray(out).astype(np.uint8), np.asarray(disparity)


_SCENE_PROGRAM = {}


def _scene_program(*args):
    """vmap of the per-slice program over the stack axis: the whole scene's
    warps, disparities, layered blurs and composites run as ONE device
    program — one H2D transfer of the image/depth instead of ``num_imgs``,
    no host round-trip between slices."""
    import jax

    if "fn" not in _SCENE_PROGRAM:
        _SCENE_PROGRAM["fn"] = jax.jit(
            jax.vmap(
                _slice_program_impl,
                in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0),
            )
        )
    return _SCENE_PROGRAM["fn"](*args)


def render_scene_fused(image, depth, depth_px, slice_params):
    """Render every slice of a scene in one device program.

    ``slice_params`` is a list of dicts with keys ``fov, beta, gamma, layers,
    coc_scale, fd_px`` (one per slice).  Kernel-size and layer-count buckets
    are taken over the whole scene so the compiled program is shared across
    scenes.  Returns ``(imgs_u8 (S, H, W, 3) BGR, disparity (S, H, W))`` —
    equivalent to per-slice ``render_slice_fused`` calls up to fp32
    accumulation order (the vmapped warp reassociates sums; the equivalence
    test asserts rtol=1e-4 on disparity, and uint8 bytes can flip on
    floor()-boundary ties).  Padding rows have zero kernels and [inf, inf)
    bounds, contributing nothing.
    """
    import jax.numpy as jnp

    s = len(slice_params)
    all_ksizes = [
        [2 * abs(k if k != 0 else 1) + 1 for k, _, _ in p["layers"]]
        for p in slice_params
    ]
    kmax = _bucket_odd(max(max(ks) for ks in all_ksizes))
    n_layers = _bucket(max(len(p["layers"]) for p in slice_params))
    kernels = np.zeros((s, n_layers, kmax, kmax), dtype=np.float32)
    bounds = np.full((s, n_layers, 2), np.inf, dtype=np.float32)
    fovs = np.empty((s,), np.float32)
    betas = np.empty((s,), np.float32)
    gammas = np.empty((s,), np.float32)
    cocs = np.empty((s,), np.float32)
    fdpx = np.empty((s,), np.float32)
    for j, (p, ksizes) in enumerate(zip(slice_params, all_ksizes)):
        for i, ((_, lo, hi), ks) in enumerate(zip(p["layers"], ksizes)):
            pad = (kmax - ks) // 2
            kernels[j, i, pad : pad + ks, pad : pad + ks] = disc_kernel(ks)
            bounds[j, i] = (lo, hi)
        fovs[j], betas[j], gammas[j] = p["fov"], p["beta"], p["gamma"]
        cocs[j], fdpx[j] = p["coc_scale"], p["fd_px"]
    out, disparity = _scene_program(
        jnp.asarray(image.astype(np.float32)),
        jnp.asarray(depth.astype(np.float32)),
        jnp.asarray(depth_px.astype(np.float32)),
        jnp.asarray(fovs), jnp.asarray(betas), jnp.asarray(gammas),
        jnp.asarray(kernels), jnp.asarray(bounds),
        jnp.asarray(cocs), jnp.asarray(fdpx),
    )
    return np.asarray(out).astype(np.uint8), np.asarray(disparity)


def render_focal_slice(
    image: np.ndarray,
    depth: np.ndarray,
    layers: Sequence[Tuple[int, float, float]],
) -> np.ndarray:
    """Depth-layered disc blur + back-to-front binary composite (`:250-270`),
    as one batched XLA convolution: all K disc PSFs (padded to a common size)
    form the output channels of a single conv over the image.

    ``image`` is float (0..255 uint8 range), ``depth`` the *unwarped* depth the
    masks are computed from (the reference masks use the original `depth`).
    Returns uint8 (H, W, 3) in the image's own channel order.
    """
    import jax.numpy as jnp

    ksizes = [2 * abs(k if k != 0 else 1) + 1 for k, _, _ in layers]
    kmax = _bucket_odd(max(ksizes))
    n_layers = _bucket(len(layers))
    kernels = np.zeros((kmax, kmax, 1, n_layers), dtype=np.float32)
    for i, ks in enumerate(ksizes):
        pad = (kmax - ks) // 2
        kernels[pad : pad + ks, pad : pad + ks, 0, i] = disc_kernel(ks)

    # the reference blurs `image.astype(np.uint8)` (truncation) — match it
    image = image.astype(np.uint8).astype(np.float32)
    img_chw = jnp.asarray(image.transpose(2, 0, 1)[..., None])
    blurred = np.asarray(_blur_all(img_chw, jnp.asarray(kernels)))  # (3, H, W, K)
    # cv2.filter2D on uint8 saturates+rounds each layer before compositing
    blurred = np.clip(np.rint(blurred), 0, 255).astype(np.uint8)

    out = np.zeros(image.shape[:2] + (3,), dtype=np.uint8)
    for i, (_, min_dis, max_dis) in enumerate(layers):
        mask = (depth >= min_dis) & (depth < max_dis)
        out[mask] = blurred[:, :, :, i].transpose(1, 2, 0)[mask]
    return out


# ---------------------------------------------------------------------------
# Scene generation
# ---------------------------------------------------------------------------


def generate_scene(
    image: np.ndarray,
    depth: np.ndarray,
    *,
    profile: DeviceProfile,
    rng: np.random.Generator,
    pixel_vs_meter: float,
    num_imgs: int = 10,
    num_planes: int = 2000,
    min_focus_dist: float = 0.1,
    max_focus_dist: float = 0.9,
):
    """Render one scene's focal stack (`:171-277`).

    Args:
      image: (H, W, 3) float in 0..255, BGR (cv2 order, like the reference).
      depth: (H, W) float64 depth in meters (already ranged, e.g. [0.1, 1.1]).

    Returns dict with ``imgs`` (N x uint8 RGB), ``depth`` (final-slice-warped
    original depth), ``disparity`` (H, W, N absolute pixel CoC — the
    reference's quirk of storing per-slice |CoC| as "defocus"), and
    ``camera_setting``.
    """
    height, width = depth.shape
    size_ratio = width / profile.native_width
    focal_length = profile.focal_length * pixel_vs_meter
    lens_dia = focal_length / profile.f_num
    max_scene_depth = float(np.max(depth))
    min_scene_depth = float(np.min(depth))
    depth_pixel = depth * pixel_vs_meter

    focus_dists = 1.0 / np.linspace(1 / max_focus_dist, 1 / min_focus_dist, num_imgs)
    min_fd_px = min_focus_dist * pixel_vs_meter
    max_fd_px = max_focus_dist * pixel_vs_meter
    min_afov = 1 / (focal_length * min_fd_px / (min_fd_px - focal_length))
    max_afov = 1 / (focal_length * max_fd_px / (max_fd_px - focal_length))
    origin_max_afov = (
        max_afov / min_afov + profile.alpha_slope * (1 / max_scene_depth) + profile.y_intercept
    )
    camera_setting = {
        "focal_length": focal_length,
        "aperture_size": lens_dia,
        "pixel_mm": pixel_vs_meter,
        "max_focus_dist": max_scene_depth,
        "min_focus_dist": min_scene_depth,
    }

    # prepass: per-slice motion + CoC layers on the host, in the reference's
    # exact RNG draw order (`:186-200`), then render the WHOLE stack as one
    # device program (render_scene_fused) — one transfer in, one out.
    slice_params = []
    fov = beta = gamma = None
    for num in range(num_imgs):
        focus_dist = focus_dists[num]
        fd_px = pixel_vs_meter * focus_dist
        lens_to_sensor = focal_length * fd_px / (fd_px - focal_length)
        if num != 0:
            alpha = profile.alpha_slope * (1 / focus_dist) + profile.y_intercept
            origin_fov = (1 / lens_to_sensor) / min_afov + alpha
            fov = origin_max_afov / origin_fov
            beta = rng.normal(profile.beta_mean, profile.beta_var) * size_ratio
            gamma = rng.normal(profile.gamma_mean, profile.gamma_var) * size_ratio
        else:
            fov, beta, gamma = 1.0, 0.0, 0.0  # identity warp, exact

        coc_scale = lens_to_sensor * lens_dia / fd_px
        layers = coc_layers(coc_scale, focus_dist, min_scene_depth, max_scene_depth, num_planes)
        slice_params.append(dict(fov=fov, beta=beta, gamma=gamma, layers=layers,
                                 coc_scale=coc_scale, fd_px=fd_px))

    stack_u8, disp_s = render_scene_fused(image, depth, depth_pixel, slice_params)
    imgs = [stack_u8[num, :, :, ::-1] for num in range(num_imgs)]  # BGR -> RGB (`:265`)
    disparity = disp_s.transpose(1, 2, 0).astype(np.float64)

    # "assume last one has smallest FOV" (`:272`)
    origin_depth = (
        warp_2d(depth.astype(np.float32), fov, beta, gamma) if num_imgs > 1 else depth
    )
    return {
        "imgs": imgs,
        "depth": np.asarray(origin_depth),
        "disparity": disparity,
        "camera_setting": camera_setting,
        "focus_dists": focus_dists,
    }


def load_nyu_v2(path: str):
    """NYU-v2 labeled .mat (v7.3 HDF5) via h5py; images (H, W, 3, B) uint8 and
    depths (H, W, B) like mat73 returned them, with 16px borders cropped."""
    import h5py

    f = h5py.File(path, "r")
    # v7.3 stores transposed: images (B, 3, W, H), depths (B, W, H)
    images = np.asarray(f["images"]).transpose(3, 2, 1, 0)
    depths = np.asarray(f["depths"]).transpose(2, 1, 0).astype(np.float64)
    return images[16:-16, 16:-16], depths[16:-16, 16:-16]


def main(argv=None):
    import cv2
    import scipy.io as sio

    parser = argparse.ArgumentParser(description="Synthetic dataset with scene movements")
    parser.add_argument("--dataset", default="NYU_move_out_0_1/", type=str)
    parser.add_argument("--nyu-mat", default="nyu_depth_v2_labeled.mat", type=str)
    parser.add_argument("--focal_length", default=0.028, type=float)
    parser.add_argument("--F_num", default=2.0, type=float)
    parser.add_argument("--pixel_vs_meter", default=1 / 0.0000014 * 352 / 4080, type=float)
    parser.add_argument("--num_imgs", default=10, type=int)
    parser.add_argument("--num_planes", default=2000, type=int)
    parser.add_argument("--max_depth", default=1.0, type=float)
    parser.add_argument("--min_depth", default=0.1, type=float)
    parser.add_argument("--limit", default=None, type=int, help="scene cap (debug)")
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args(argv)

    height, width = 224, 352
    images, depths = load_nyu_v2(args.nyu_mat)
    n_scenes = images.shape[3] if args.limit is None else min(args.limit, images.shape[3])
    rng = np.random.default_rng(args.seed)
    start = time.time()

    def write_scene(save_path, img_idx, out):
        # host-side PNG encode + .mat writes, overlapped with the next scene's
        # device render (cv2.imwrite releases the GIL while encoding)
        for num, img in enumerate(out["imgs"]):
            cv2.imwrite(save_path + f"img{num}.png", img)
        if np.min(out["depth"]) == 0:
            print(f"[dffx.sim] scene {img_idx}: warped depth hit zero — kept anyway "
                  "(the reference aborted here)")
        sio.savemat(save_path + "depth.mat", {"depth": out["depth"], "defocus": out["disparity"]})
        sio.savemat(save_path + "camera_param.mat", out["camera_setting"])

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        pending = []
        for img_idx in range(n_scenes):
            profile = DEVICE_PROFILES[int(rng.integers(0, len(DEVICE_PROFILES)))]
            save_path = os.path.join(args.dataset, str(img_idx)) + "/"
            os.makedirs(save_path, exist_ok=True)

            depth = cv2.resize(depths[:, :, img_idx], (width, height))
            depth = args.max_depth * (depth - depth.min()) / (depth.max() - depth.min())
            depth = depth + args.min_depth
            image = cv2.resize(images[:, :, :, img_idx].astype(np.float32), (width, height))
            image = image[:, :, ::-1]  # RGB -> BGR, the reference pipeline's cv2 order

            out = generate_scene(
                image,
                depth,
                profile=profile,
                rng=rng,
                pixel_vs_meter=args.pixel_vs_meter,
                num_imgs=args.num_imgs,
                num_planes=args.num_planes,
            )
            pending.append(pool.submit(write_scene, save_path, img_idx, out))
            while len(pending) > 4:  # bound memory; surface write errors early
                pending.pop(0).result()
        for f in pending:
            f.result()

    n = max(n_scenes, 1)
    print("avg_time: ", (time.time() - start) / n)


if __name__ == "__main__":
    main()
