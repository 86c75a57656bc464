"""ctypes bindings for the native host-side data-path library (csrc/dffxio.cc).

The C++ library fuses the loader hot path — uint8→float ``x/127.5-1``
normalization, pad-to-x32, layout conversion — into one multithreaded pass.
Everything here degrades gracefully to numpy when the .so hasn't been built;
``ensure_built()`` compiles it on demand with the in-image toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libdffxio.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def ensure_built(quiet: bool = True) -> bool:
    """Build libdffxio.so if missing; returns availability."""
    global _tried
    if os.path.exists(_SO):
        return True
    if _tried:
        return False
    _tried = True
    try:
        subprocess.run(
            ["make", "-C", _CSRC],
            check=True,
            capture_output=quiet,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


_REQUIRED_VERSION = 4  # bump when csrc adds entry points or changes guards


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    lib = ctypes.CDLL(_SO)
    lib.dffxio_version.restype = ctypes.c_int
    if lib.dffxio_version() < _REQUIRED_VERSION:
        # Stale build from an older checkout: rebuild, then dlopen a COPY —
        # dlopen caches by path, so re-CDLL'ing the original path would hand
        # back the already-loaded old library and the new symbols would be
        # missing (and rebuilding in place under an mmapped .so is UB anyway).
        try:
            import shutil

            subprocess.run(["make", "-B", "-C", _CSRC], check=True,
                           capture_output=True)
            versioned = f"{_SO}.v{_REQUIRED_VERSION}"
            shutil.copy2(_SO, versioned)
            lib = ctypes.CDLL(versioned)
            lib.dffxio_version.restype = ctypes.c_int
            if lib.dffxio_version() < _REQUIRED_VERSION:
                return None  # rebuild didn't take — degrade to fallbacks
        except Exception:
            return None
    i64, f32, i32 = ctypes.c_int64, ctypes.c_float, ctypes.c_int
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.dffxio_normalize_u8.argtypes = [u8p, f32p, i64]
    lib.dffxio_normalize_pad_stack.argtypes = [u8p, f32p, i64, i64, i64, i64, i64, i64, f32, i32]
    lib.dffxio_normalize_pad_stack_f32.argtypes = [f32p, f32p, i64, i64, i64, i64, i64, i64, f32, i32]
    lib.dffxio_hwcn_to_nhwc_normalize.argtypes = [f64p, f32p, i64, i64, i64, i64, i32]
    pi64 = ctypes.POINTER(ctypes.c_int64)
    for name in ("dffxio_jpeg_info", "dffxio_png_info"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, i64, pi64, pi64]
        fn.restype = ctypes.c_int
    for name in ("dffxio_jpeg_decode", "dffxio_png_decode"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, i64, u8p, i64, i64]
        fn.restype = ctypes.c_int
    for name in ("dffxio_tiff_info", "dffxio_png_info_unchanged"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, i64, pi64, pi64, pi64]
        fn.restype = ctypes.c_int
    lib.dffxio_tiff_decode_bgr.argtypes = [u8p, i64, u8p, i64, i64]
    lib.dffxio_tiff_decode_bgr.restype = ctypes.c_int
    for name in ("dffxio_tiff_decode_raw", "dffxio_png_decode_unchanged"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, i64, ctypes.c_void_p, i64, i64, i64]
        fn.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def normalize_pad_stack(
    stack: np.ndarray, pad_value: float = -1.0, threads: int = 4
) -> np.ndarray:
    """(N, H, W, C) uint8/float32 → (N, Hp, Wp, C) float32, normalized
    ``x/127.5 - 1`` and padded to multiples of 32 with ``pad_value``."""
    n, h, w, c = stack.shape
    hp = h + (32 - h % 32) % 32
    wp = w + (32 - w % 32) % 32
    lib = _load()
    if lib is None:
        out = np.asarray(stack, dtype=np.float32) / 127.5 - 1.0
        return np.pad(
            out, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), constant_values=pad_value
        )
    dst = np.empty((n, hp, wp, c), dtype=np.float32)
    if stack.dtype == np.uint8:
        lib.dffxio_normalize_pad_stack(
            np.ascontiguousarray(stack), dst, n, h, w, c, hp, wp, pad_value, threads
        )
    else:
        lib.dffxio_normalize_pad_stack_f32(
            np.ascontiguousarray(stack, dtype=np.float32), dst, n, h, w, c, hp, wp,
            pad_value, threads,
        )
    return dst


def hwcn_to_nhwc_normalize(stack: np.ndarray, threads: int = 4) -> np.ndarray:
    """(H, W, C, N) float64 → (N, H, W, C) float32 normalized ``x/127.5-1``."""
    lib = _load()
    if lib is None:
        return np.ascontiguousarray(
            (stack / 127.5 - 1.0).transpose(3, 0, 1, 2)
        ).astype(np.float32)
    h, w, c, n = stack.shape
    dst = np.empty((n, h, w, c), dtype=np.float32)
    lib.dffxio_hwcn_to_nhwc_normalize(
        np.ascontiguousarray(stack, dtype=np.float64), dst, h, w, c, n, threads
    )
    return dst


def _jpeg_exif_orientation(buf: bytes) -> int:
    """EXIF Orientation (1 when absent/unparseable).  libjpeg ignores EXIF
    but cv2.imread auto-rotates; oriented files must take the cv2 path or
    the two decoders disagree by a rotation."""
    try:
        i, n = 2, len(buf)
        while i + 4 <= n and buf[i] == 0xFF:
            marker = buf[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2
                continue
            if marker == 0xDA:  # start of scan — no EXIF seen
                break
            seglen = int.from_bytes(buf[i + 2 : i + 4], "big")
            if marker == 0xE1 and buf[i + 4 : i + 10] == b"Exif\x00\x00":
                t = i + 10
                bo = "little" if buf[t : t + 2] == b"II" else "big"
                p = t + int.from_bytes(buf[t + 4 : t + 8], bo)
                cnt = int.from_bytes(buf[p : p + 2], bo)
                for k in range(cnt):
                    e = p + 2 + 12 * k
                    if int.from_bytes(buf[e : e + 2], bo) == 0x0112:
                        return int.from_bytes(buf[e + 8 : e + 10], bo) or 1
                return 1
            i += 2 + seglen
    except Exception:
        pass
    return 1


#: unchanged-decode ``kind`` codes shared with csrc (dtype, channels)
_KIND = {1: (np.uint8, 1), 2: (np.uint16, 1), 3: (np.float32, 1),
         4: (np.uint8, 3), 5: (np.uint16, 3)}


def _read_buf(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.frombuffer(f.read(), np.uint8)


def _is_tiff(head: bytes) -> bool:
    return head[:4] in (b"II*\x00", b"MM\x00*")


def imread(path: str) -> Optional[np.ndarray]:
    """cv2.imread-compatible decode — ``(H, W, 3)`` uint8 **BGR** — through
    libjpeg/libpng/libtiff (csrc), without OpenCV.  Returns ``None`` when the
    native library is unavailable, the file isn't a JPEG/PNG/TIFF, the JPEG
    carries a non-identity EXIF orientation (cv2 auto-rotates those), the PNG
    has an alpha channel / 16-bit depth (libpng composites/rescales
    differently from cv2), or the TIFF isn't 8-bit gray/RGB (the cases where
    OpenCV also routes through libtiff's RGBA reader, so values match); the
    fallback in ``imread_compat`` keeps behaviour identical."""
    lib = _load()
    if lib is None or not hasattr(lib, "dffxio_jpeg_info"):
        return None
    buf = _read_buf(path)
    head = buf[:8].tobytes()
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    if _is_tiff(head):
        # the DefocusNet `All.tif` focal stacks (train_Dataloader.py:84,104)
        k = ctypes.c_int64()
        if lib.dffxio_tiff_info(buf, len(buf), ctypes.byref(h), ctypes.byref(w),
                                ctypes.byref(k)) != 0 or k.value not in (1, 4):
            return None
        out = np.empty((h.value, w.value, 3), np.uint8)
        if lib.dffxio_tiff_decode_bgr(buf, len(buf), out, h.value, w.value) != 0:
            return None
        return out
    if head[:2] == b"\xff\xd8":
        if _jpeg_exif_orientation(buf.tobytes()) != 1:
            return None
        info, dec = lib.dffxio_jpeg_info, lib.dffxio_jpeg_decode
    elif head == b"\x89PNG\r\n\x1a\n":
        info, dec = lib.dffxio_png_info, lib.dffxio_png_decode
    else:
        return None
    if info(buf, len(buf), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if dec(buf, len(buf), out, h.value, w.value) != 0:
        return None
    return out


def imread_unchanged(path: str) -> Optional[np.ndarray]:
    """cv2.imread(..., IMREAD_UNCHANGED)-compatible decode for PNG/TIFF —
    the reference's raw GT reads (Smartphone merged-depth PNG,
    `train_Dataloader.py:341`; float/16-bit depth TIFFs).  Grayscale files
    come back ``(H, W)`` in their native dtype, color as ``(H, W, {3})`` BGR,
    exactly as cv2 returns them.  ``None`` for anything else (palette, alpha,
    interlace, exotic layouts) — `imread_unchanged_compat` falls back."""
    lib = _load()
    if lib is None:
        return None
    buf = _read_buf(path)
    head = buf[:8].tobytes()
    if _is_tiff(head):
        info, dec = lib.dffxio_tiff_info, lib.dffxio_tiff_decode_raw
    elif head == b"\x89PNG\r\n\x1a\n":
        info, dec = lib.dffxio_png_info_unchanged, lib.dffxio_png_decode_unchanged
    else:
        return None
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    k = ctypes.c_int64()
    if info(buf, len(buf), ctypes.byref(h), ctypes.byref(w), ctypes.byref(k)) != 0:
        return None
    dtype, ch = _KIND[k.value]
    shape = (h.value, w.value) if ch == 1 else (h.value, w.value, ch)
    out = np.empty(shape, dtype)
    if dec(buf, len(buf), out.ctypes.data, h.value, w.value, k.value) != 0:
        return None
    return out


def imread_compat(path: str) -> np.ndarray:
    """``imread`` with a cv2 fallback for formats the native path doesn't
    cover or when the .so is missing."""
    img = imread(path)
    if img is not None:
        return img
    import cv2

    return cv2.imread(path)


def imread_unchanged_compat(path: str) -> np.ndarray:
    """``imread_unchanged`` with a cv2 IMREAD_UNCHANGED fallback."""
    img = imread_unchanged(path)
    if img is not None:
        return img
    import cv2

    return cv2.imread(path, cv2.IMREAD_UNCHANGED)
