"""Native (C++) host-runtime components, built on demand with g++.

The reference's entire runtime is native (Rust); the TPU rebuild keeps the
compute path in XLA/Pallas and implements host-side runtime pieces natively
in C++ (SURVEY.md §2 header).  Bindings are plain ctypes over a C ABI — the
environment ships no pybind11.

Components:
  * hamming.cpp   — brute-force Hamming matcher (host fallback, baseline).
  * akaze_cpu.cpp — full single-core CPU AKAZE detect+describe: the MEASURED
    reference baseline for BASELINE.md (the Rust reference cannot be built
    here) and a second, independent parity oracle next to the golden model.

Build is lazy and cached next to the source (.so keyed by source hash);
callers must handle `available() == False` (no compiler) by falling back to
the JAX/NumPy implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SOURCES = [_DIR / "hamming.cpp", _DIR / "akaze_cpu.cpp"]
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build() -> pathlib.Path | None:
    tag = hashlib.sha1(
        b"".join(s.read_bytes() for s in _SOURCES)
    ).hexdigest()[:12]
    out = _DIR / f"_native_{tag}.so"
    if out.exists():
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *[str(s) for s in _SOURCES], "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
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
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.akaze_match_hamming.restype = ctypes.c_int
    lib.akaze_match_hamming.argtypes = [
        u32p, ctypes.c_int, u32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, i32p, i32p, u8p,
    ]
    lib.akaze_cpu_extract.restype = ctypes.c_int
    lib.akaze_cpu_extract.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int,  # img, h, w
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f32p, u8p,
    ]
    lib.akaze_cpu_bench_pipeline.restype = ctypes.c_double
    lib.akaze_cpu_bench_pipeline.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
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


_DIFFUSIVITY_CODE = {"pm_g1": 0, "pm_g2": 1, "weickert": 2}


def extract_native(img: np.ndarray, config=None, max_out: int = 4096):
    """Single-core CPU AKAZE extract (native, akaze_cpu.cpp).

    Returns (kps float32 (N, 7): x, y, response, size, octave, class_id,
    angle; desc uint8 (N, 61)).  Plays the reference binary's role: the
    measured baseline and a golden-model cross-check."""
    from akaze_tpu.core.config import AkazeConfig

    lib = _load()
    if lib is None:
        raise RuntimeError("native AKAZE unavailable (no g++?)")
    config = config or AkazeConfig()
    assert config.descriptor_channels == 3, "native path is fixed at 3 channels"
    img = np.ascontiguousarray(img, np.float32)
    assert img.ndim == 2
    kps = np.zeros((max_out, 7), np.float32)
    desc = np.zeros((max_out, 61), np.uint8)
    n = lib.akaze_cpu_extract(
        img, img.shape[0], img.shape[1],
        config.num_octaves, config.num_sublevels,
        ctypes.c_float(config.base_scale_offset),
        ctypes.c_float(config.derivative_factor),
        ctypes.c_float(config.detector_threshold),
        ctypes.c_float(config.contrast_percentile), config.contrast_nbins,
        ctypes.c_float(config.contrast_fallback),
        ctypes.c_float(config.contrast_octave_decay),
        _DIFFUSIVITY_CODE[config.diffusivity.value],
        ctypes.c_float(config.fed_tau_max), config.min_octave_dim,
        config.descriptor_pattern_size,
        max_out, kps, desc,
    )
    return kps[:n], desc[:n]


def bench_pipeline_native(
    img_a: np.ndarray,
    img_b: np.ndarray,
    reps: int = 3,
    diffusivity: str = "pm_g2",
) -> float:
    """Measured single-core CPU baseline: seconds per frame for the full
    detect+describe+match pipeline on an image pair (BASELINE.md protocol).
    `diffusivity` selects the conductivity variant so config-3 comparisons
    are same-variant on both sides."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native AKAZE unavailable (no g++?)")
    img_a = np.ascontiguousarray(img_a, np.float32)
    img_b = np.ascontiguousarray(img_b, np.float32)
    assert img_a.shape == img_b.shape and img_a.ndim == 2
    return float(
        lib.akaze_cpu_bench_pipeline(
            img_a, img_b, img_a.shape[0], img_a.shape[1], reps,
            _DIFFUSIVITY_CODE[diffusivity],
        )
    )
