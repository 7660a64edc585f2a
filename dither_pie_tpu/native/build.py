"""On-demand compilation + ctypes bindings for the native ED engine.

Compiles ``ed_scan.cpp`` with g++ on first use into a per-source-hash cached
shared object (so edits invalidate the cache automatically). No build system
required at install time; falls back gracefully (``native_available() ->
False``) when no compiler is present, in which case callers use the slower
NumPy scan in ``ops/ed_host.py``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "ed_scan.cpp"
_BUILD_DIR = Path(
    os.environ.get("DITHER_PIE_TPU_BUILD_DIR", Path(__file__).parent / "_build")
)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")


_CFLAGS = [
    "-O3",
    "-march=native",  # vectorize the f32 fast-path distance loops
    "-fPIC",
    "-shared",
    # Float determinism: the engine is a golden reference, so no
    # fast-math / contraction (FMA would change rounding vs NumPy).
    "-ffp-contract=off",
    "-fno-fast-math",
]


def _host_cpu_id() -> bytes:
    """Host CPU feature identity — part of the build-cache key, since a
    -march=native .so built on one machine can SIGILL on another (shared
    venv / NFS / copied container layers)."""
    try:
        with open("/proc/cpuinfo", "r", encoding="utf-8") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return line.encode()
    except OSError:
        pass
    import platform

    return (platform.machine() + platform.processor()).encode()


def _compile() -> Path:
    key = hashlib.sha256(
        _SRC.read_bytes() + " ".join(_CFLAGS).encode()
        + _host_cpu_id()).hexdigest()[:16]
    out = _BUILD_DIR / f"libed_scan_{key}.so"
    if out.exists():
        return out
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".so.tmp")
    cmd = ["g++", *_CFLAGS, str(_SRC), "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # Old toolchains / exotic hosts: retry without -march=native.
        cmd = ["g++", *[f for f in _CFLAGS if f != "-march=native"],
               str(_SRC), "-o", str(tmp)]
        subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)
    return out


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c_i, c_f = ctypes.c_int, ctypes.c_float
    lib.ed_fixed.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _i32p, _f32p, c_i, c_i]
    lib.ed_ostromoukhov.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _i32p, c_i]
    lib.ed_hybrid.argtypes = [_f32p, c_i, c_i, _f32p, c_i, c_f, c_f, c_i]
    lib.ed_perceptual.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _f32p]
    lib.ed_adaptive.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _u8p]
    lib.ed_riemersma.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _i32p, ctypes.c_int64]
    lib.ed_fixed_f32.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _i32p, _f32p, c_i, c_i]
    lib.ed_ostromoukhov_f32.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _i32p, c_i]
    lib.ed_hybrid_f32.argtypes = [_f32p, c_i, c_i, _f32p, c_i, c_f, c_f, c_i]
    lib.ed_perceptual_f32.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _f32p]
    lib.ed_adaptive_f32.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _u8p]
    lib.ed_riemersma_f32.argtypes = [_f32p, c_i, c_i, _f32p, c_i, _i32p,
                                     ctypes.c_int64]
    for fn in ("ed_fixed", "ed_ostromoukhov", "ed_hybrid", "ed_perceptual",
               "ed_adaptive", "ed_riemersma", "ed_fixed_f32",
               "ed_ostromoukhov_f32", "ed_hybrid_f32", "ed_perceptual_f32",
               "ed_adaptive_f32", "ed_riemersma_f32"):
        getattr(lib, fn).restype = None
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled engine, or None if compilation is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            so = _compile()
            _lib = _bind(ctypes.CDLL(str(so)))
        except Exception:
            _lib = None
    return _lib


def native_available() -> bool:
    return get_lib() is not None
