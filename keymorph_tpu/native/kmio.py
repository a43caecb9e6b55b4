"""ctypes binding for libkmio, the C++ IO/preprocess fast path.

The torch reference leans on nibabel/TorchIO's compiled internals for volume
IO and resampling (SURVEY §2: "the native-performance layer the reference
implicitly relies on"); libkmio is our equivalent: zlib decompression,
NIfTI payload decode, and trilinear resize, all multithread-free C++ tuned
for the single-core host feeding the TPU.

Falls back cleanly when the shared library hasn't been built
(`make -C keymorph_tpu/native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    path = os.path.join(here, "libkmio.so")
    if not os.path.exists(path):
        # build on first use (the .so is not committed)
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", here], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.km_gunzip.restype = ctypes.c_longlong
        lib.km_gunzip.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_char_p),
        ]
        lib.km_free.argtypes = [ctypes.c_char_p]
        lib.km_resize_trilinear.restype = ctypes.c_int
        lib.km_resize_trilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def gunzip_file(path: str) -> bytes:
    """Decompress a .gz file via the C++ zlib path."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libkmio not built")
    out = ctypes.c_char_p()
    n = lib.km_gunzip(path.encode(), ctypes.byref(out))
    if n < 0:
        raise IOError(f"km_gunzip failed on {path} (code {n})")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.km_free(out)


def resize_trilinear(src: np.ndarray, target, nearest: bool = False) -> np.ndarray:
    """C++ trilinear/nearest volume resize (align_corners=False centers)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libkmio not built")
    src = np.ascontiguousarray(src, np.float32)
    assert src.ndim == 3
    out = np.empty(tuple(target), np.float32)
    rc = lib.km_resize_trilinear(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *src.shape,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *out.shape,
        1 if nearest else 0,
    )
    if rc != 0:
        raise RuntimeError(f"km_resize_trilinear failed ({rc})")
    return out
