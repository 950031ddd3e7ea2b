"""ctypes binding for the native host pipeline (csrc/yst_host.cpp).

Compiles the shared library on first use (cached next to the source) and
exposes:

* ``decode_file(path, channels)`` -> (H, W, C) uint8
* ``prepare_batch(paths, img_size, channels, letterbox, threads)`` ->
  (imgs (N, S, S, C) float32 in [0,1], meta (N, 5) [w, h, scale, px, py],
  status (N,) int32)

``available()`` gates use; callers fall back to the cv2/PIL path when the
toolchain or image libs are missing.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_SO = _CSRC / "libyst_host.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(_CSRC / "yst_host.cpp"), "-o", str(_SO),
                "-lpng", "-ljpeg", "-lz", "-pthread",
            ],
            check=True,
            capture_output=True,
            timeout=240,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _CSRC / "yst_host.cpp"
    if not src.exists():
        return None
    if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    lib.yst_decode_file.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.yst_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.yst_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.yst_prepare_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint8, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    if hasattr(lib, "yst_prepare_batch_u8"):
        lib.yst_prepare_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint8, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
    # ABI guard: the fast_jpeg param landed in v2; a stale .so would read
    # garbage for it. _load() rebuilds on source mtime, so this only trips
    # if the rebuild failed and an old binary survived.
    if lib.yst_version() < 2:
        return None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_file(path: str, channels: int = 1) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.yst_decode_file(str(path).encode(), channels, ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise IOError(f"native decode failed: {path}")
    n = w.value * h.value * channels
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy().reshape(h.value, w.value, channels)
    lib.yst_free(ptr)
    return arr


def prepare_batch(
    paths: Sequence[str],
    img_size: int,
    channels: int = 1,
    letterbox: bool = False,
    pad_value: int = 114,
    threads: int = 4,
    dtype: str = "float32",
    fast_jpeg: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``dtype='uint8'`` skips host normalization (4x less host->device
    transfer; do ``x.astype(...)/255`` inside jit instead).

    ``fast_jpeg``: JPEGs decode at the smallest libjpeg M/8 scale that
    still covers the target canvas (a 1024px JPEG headed for 640px decodes
    at 5/8 straight to 640), skipping most of the IDCT and the bilinear
    resize. Decode-time scaling is DCT-domain, so JPEG pixels differ
    slightly from full-decode+bilinear (cv2 parity); pass False for exact
    cv2-compatible semantics. PNGs are unaffected either way."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    n = len(paths)
    meta = np.empty((n, 5), np.float32)
    status = np.empty((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    if dtype == "uint8":
        out = np.empty((n, img_size, img_size, channels), np.uint8)
        lib.yst_prepare_batch_u8(
            c_paths, n, img_size, channels, int(letterbox), pad_value, threads,
            int(fast_jpeg),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    else:
        out = np.empty((n, img_size, img_size, channels), np.float32)
        lib.yst_prepare_batch(
            c_paths, n, img_size, channels, int(letterbox), pad_value, threads,
            int(fast_jpeg),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    return out, meta, status
