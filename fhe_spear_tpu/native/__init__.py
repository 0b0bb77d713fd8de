"""Native (C++/OpenMP) host components with graceful numpy fallbacks.

`batch_encode(slots, scale, t_slot, t_conj, n)` — the batch CKKS encoder
used for diagonal pre-encoding (see batch_encoder.cpp).  The shared
library is built on first use with g++; if the toolchain is unavailable
the caller falls back to the numpy encoder transparently.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_lib = None
_tried = False


def _so_path(src: str) -> str:
    """Build-cache path keyed on a hash of the source, so source edits
    always trigger a recompile (a stale committed binary can never shadow
    the current code)."""
    with open(src, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "FHE_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "fhe_spear_native"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"libbatchenc-{h}.so")


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_DIR, "batch_encoder.cpp")
    so = _so_path(src)
    if not os.path.exists(so):
        # -march=native is opt-in (FHE_NATIVE_MARCH=1): a binary built with
        # it SIGILLs when the cache dir is shared with an older host
        flags = ["-O3", "-fopenmp", "-shared", "-fPIC"]
        if os.environ.get("FHE_NATIVE_MARCH"):
            flags.insert(1, "-march=native")
        try:
            subprocess.run(["g++", *flags, "-o", so, src],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.batch_encode.restype = ctypes.c_int
        lib.batch_encode.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def batch_encode(slots: np.ndarray, scale: float, t_slot: np.ndarray,
                 t_conj: np.ndarray, n: int) -> np.ndarray | None:
    """Complex slots [rows, n/2] -> int32 coefficients [rows, n], or None
    if the native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    slots = np.ascontiguousarray(slots, dtype=np.complex128)
    rows = int(np.prod(slots.shape[:-1], initial=1))
    re = np.ascontiguousarray(slots.real.reshape(rows, -1))
    im = np.ascontiguousarray(slots.imag.reshape(rows, -1))
    ts = np.ascontiguousarray(t_slot, dtype=np.int64)
    tc = np.ascontiguousarray(t_conj, dtype=np.int64)
    out = np.empty((rows, n), dtype=np.int32)
    rc = lib.batch_encode(
        re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows, n, float(scale),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        tc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise OverflowError("native batch_encode: coefficient > int32")
    return out.reshape(slots.shape[:-1] + (n,))
