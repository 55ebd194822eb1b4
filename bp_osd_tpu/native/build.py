"""Build + load the native GF(2) kernel (ctypes, cached shared object).

Compiles ``gf2_native.cpp`` with the system C++ toolchain on first use and
caches the shared object per source-hash; environments without a compiler
fall back to the NumPy path transparently (``load() -> None``).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "gf2_native.cpp")
_CACHE_DIR = os.environ.get(
    "BP_OSD_TPU_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "bp_osd_tpu"),
)

_lib = None
_tried = False


def _compile() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"gf2_native_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    for cxx in ("g++", "clang++", "c++"):
        try:
            with tempfile.TemporaryDirectory() as tmp:
                tmp_so = os.path.join(tmp, "gf2_native.so")
                subprocess.run(
                    [cxx, "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-o", tmp_so, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.replace(tmp_so, so_path)
            return so_path
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def load():
    """ctypes handle to the native library, or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so_path = _compile()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.gf2_row_echelon.restype = ctypes.c_int
    lib.gf2_row_echelon.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),  # P
        ctypes.POINTER(ctypes.c_uint64),  # T (nullable)
        ctypes.c_int64,  # m
        ctypes.c_int64,  # W
        ctypes.c_int64,  # n
        ctypes.c_int64,  # Wt
        ctypes.c_int,  # full
        ctypes.POINTER(ctypes.c_int64),  # pivot_cols
    ]
    lib.gf2_rank.restype = ctypes.c_int
    lib.gf2_rank.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib
