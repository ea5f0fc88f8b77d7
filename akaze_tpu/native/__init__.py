"""Native (C++) host-runtime components, built on demand with g++.

The reference's entire runtime is native (Rust); the TPU rebuild keeps the
compute path in XLA/Pallas and implements host-side runtime pieces natively
in C++ (SURVEY.md §2 header).  Bindings are plain ctypes over a C ABI — the
environment ships no pybind11.

Build is lazy and cached next to the source (.so keyed by source mtime);
callers must handle `available() == False` (no compiler) by falling back to
the JAX/NumPy implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess

import numpy as np

_SRC = pathlib.Path(__file__).with_name("hamming.cpp")
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build() -> pathlib.Path | None:
    tag = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
    out = _SRC.parent / f"_hamming_{tag}.so"
    if out.exists():
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return out


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.akaze_match_hamming.restype = ctypes.c_int
    lib.akaze_match_hamming.argtypes = [
        u32p, ctypes.c_int, u32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, i32p, i32p, u8p,
    ]
    lib.akaze_bench_match.restype = ctypes.c_double
    lib.akaze_bench_match.argtypes = [ctypes.c_int] * 4
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def match_hamming_native(
    a: np.ndarray, b: np.ndarray,
    ratio: float = 0.8, mutual: bool = True, max_distance: int = 486,
):
    """Native brute-force matcher; a/b uint32 (N, W)/(M, W).

    Returns (idx_b (N,) i32, distance (N,) i32, accepted (N,) bool)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native matcher unavailable (no g++?)")
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint32)
    assert a.ndim == 2 and b.ndim == 2 and a.shape[1] == b.shape[1]
    na = a.shape[0]
    idx = np.zeros(na, np.int32)
    dist = np.zeros(na, np.int32)
    acc = np.zeros(na, np.uint8)
    if na and b.shape[0]:
        lib.akaze_match_hamming(
            a, na, b, b.shape[0], a.shape[1],
            ctypes.c_float(ratio), int(mutual), int(max_distance),
            idx, dist, acc,
        )
    return idx, dist, acc.astype(bool)
