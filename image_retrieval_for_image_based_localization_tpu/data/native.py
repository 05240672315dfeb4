"""ctypes bindings for the native (C++) preprocessing library.

``native/preproc.cpp`` does multi-threaded JPEG/PNG decode + max-side
bilinear resize + ImageNet normalization straight into padded NHWC float32
batch buffers — the framework's first-party replacement for the reference's
PIL/libjpeg host path (SURVEY.md §2.1). Falls back to the PIL pipeline when
the shared library isn't built (``make -C native``); the extractor's
prefetch thread overlaps either with device compute.

Numerics: bilinear with half-pixel centers — not bitwise PIL; descriptor
differences are at resize-interpolation level (cosine ~1). The parity path
(`data.images`) stays PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


_ABI_VERSION = 2  # must match irtpu_abi_version() in preproc.cpp


def _make(force: bool = False) -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"] + (["-B"] if force else []),
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libirtpu_preproc.so")
    if not os.path.exists(so) and not _make():
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    # a stale prebuilt .so (older exported signatures) is rebuilt in place
    if not hasattr(lib, "irtpu_abi_version") or lib.irtpu_abi_version() != _ABI_VERSION:
        if not _make(force=True):
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        if not hasattr(lib, "irtpu_abi_version") or lib.irtpu_abi_version() != _ABI_VERSION:
            return None
    lib.irtpu_preprocess_batch.restype = ctypes.c_int
    lib.irtpu_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,  # filter
        ctypes.c_int,  # nthreads
    ]
    lib.irtpu_preprocess_batch_u8.restype = ctypes.c_int
    lib.irtpu_preprocess_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,  # filter
        ctypes.c_int,  # nthreads
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def preprocess_batch_native(
    paths: Sequence[str],
    image_size: int,
    out_h: int,
    out_w: int,
    bbxs: Optional[Sequence] = None,
    nthreads: int = 0,
    upscale: bool = True,
    resize_filter: str = "bilinear",
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize+normalize ``paths`` into a padded batch.

    ``upscale=False`` = reference thumbnail semantics (shrink-only);
    ``resize_filter='lanczos'`` = the reference's antialiased LANCZOS
    (PIL-compatible coefficients, see preproc.cpp). Returns (pixels
    [n, out_h, out_w, 3] uint8 RAW — normalization happens on device, see
    data.images.ImageBatch — and sizes [n, 2] int32 valid h/w; (0, 0)
    marks a failed decode).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native preproc library unavailable; build native/")
    n = len(paths)
    out = np.zeros((n, out_h, out_w, 3), np.uint8)
    sizes = np.zeros((n, 2), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    bbx_arr = None
    bbx_ptr = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    if bbxs is not None and any(b is not None for b in bbxs):
        bbx_arr = np.zeros((n, 4), np.float32)
        for i, b in enumerate(bbxs):
            bbx_arr[i] = b if b is not None else (0, 0, 10**8, 10**8)
        bbx_ptr = bbx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 4)
    try:
        filt = {"bilinear": 0, "lanczos": 1}[resize_filter]
    except KeyError:
        raise ValueError(f"unknown resize filter {resize_filter!r} (bilinear|lanczos)")
    lib.irtpu_preprocess_batch_u8(
        c_paths,
        n,
        image_size if upscale else -image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_h,
        out_w,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        bbx_ptr,
        filt,
        nthreads,
    )
    return out, sizes
