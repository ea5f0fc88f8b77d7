"""Deterministic synthetic test scenes.

The reference ships checked-in grayscale frames for regression tests
(SURVEY.md §2 C15); this environment has no image assets, so tests and
benchmarks use reproducible synthetic textured scenes instead: smooth
gradients + Gaussian blobs + a warped checkerboard + band-limited noise give
AKAZE plenty of corners and blobs at multiple scales.

Also provides a planar homography warp so two-view tests have ground truth.
"""

from __future__ import annotations

import numpy as np


def textured_scene(height: int = 480, width: int = 640, seed: int = 0) -> np.ndarray:
    """float32 (H, W) image in [0, 1] with multi-scale structure."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:height, 0:width].astype(np.float32)
    img = 0.3 + 0.2 * np.sin(2 * np.pi * x / width) * np.cos(2 * np.pi * y / height)

    # Gaussian blobs at random positions/scales (sharp, multi-scale).
    n_blobs = max(20, width * height // 4000)
    for _ in range(n_blobs):
        cx = rng.uniform(0.05, 0.95) * width
        cy = rng.uniform(0.05, 0.95) * height
        s = rng.uniform(1.5, 20.0)
        a = rng.uniform(-0.5, 0.5)
        img += a * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))

    # Warped checkerboard for corner-like structure at two scales.
    u = x / width * 16 + 0.7 * np.sin(2 * np.pi * y / height * 2)
    v = y / height * 12 + 0.7 * np.sin(2 * np.pi * x / width * 3)
    img += 0.25 * ((np.floor(u) + np.floor(v)) % 2 - 0.5)
    img += 0.12 * ((np.floor(u * 3.7) + np.floor(v * 3.1)) % 2 - 0.5)

    # Band-limited noise: upsampled coarse noise.
    coarse = rng.normal(0.0, 1.0, (height // 8 + 1, width // 8 + 1)).astype(np.float32)
    noise = np.kron(coarse, np.ones((8, 8), dtype=np.float32))[:height, :width]
    img += 0.03 * noise

    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def warp_homography(img: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Inverse-warp `img` by homography H (maps src -> dst), bilinear sampling."""
    height, width = img.shape
    yd, xd = np.mgrid[0:height, 0:width].astype(np.float64)
    Hinv = np.linalg.inv(H)
    w = Hinv[2, 0] * xd + Hinv[2, 1] * yd + Hinv[2, 2]
    xs = (Hinv[0, 0] * xd + Hinv[0, 1] * yd + Hinv[0, 2]) / w
    ys = (Hinv[1, 0] * xd + Hinv[1, 1] * yd + Hinv[1, 2]) / w
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, width - 2)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, height - 2)
    fx = np.clip(xs - x0, 0.0, 1.0)
    fy = np.clip(ys - y0, 0.0, 1.0)
    out = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )
    inside = (xs >= 0) & (xs <= width - 1) & (ys >= 0) & (ys <= height - 1)
    return np.where(inside, out, 0.0).astype(np.float32)


def video_sequence(
    num_frames: int, height: int = 480, width: int = 640, seed: int = 0
) -> np.ndarray:
    """Synthetic panning/zooming video: float32 (T, H, W)."""
    base = textured_scene(height * 2, width * 2, seed=seed)
    frames = np.zeros((num_frames, height, width), dtype=np.float32)
    for t in range(num_frames):
        ox = int(width / 2 + 40 * np.sin(2 * np.pi * t / max(num_frames, 2)))
        oy = int(height / 2 + 25 * np.cos(2 * np.pi * t / max(num_frames, 2)))
        frames[t] = base[oy : oy + height, ox : ox + width]
    return frames
