"""Two-view geometry tests: synthetic scenes with known ground-truth pose."""

import numpy as np
import pytest

from akaze_tpu.core.config import RansacConfig
from akaze_tpu.geometry.twoview import (
    estimate_relative_pose,
    normalize_points,
    triangulate,
)


def _rotmat(axis, angle):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _synthetic_pair(n=200, n_outliers=40, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
    R = _rotmat([0.2, 1.0, 0.1], 0.15)
    t = np.array([0.5, -0.1, 0.08])
    t /= np.linalg.norm(t)
    x1 = pts / pts[:, 2:3]
    p2 = pts @ R.T + t
    x2 = p2 / p2[:, 2:3]
    x1[:, :2] += rng.normal(0, noise, (n, 2))
    x2[:, :2] += rng.normal(0, noise, (n, 2))
    # Corrupt a tail of correspondences.
    if n_outliers:
        x2[-n_outliers:, :2] = rng.uniform(-0.5, 0.5, (n_outliers, 2))
    mask = np.ones(n, bool)
    return (
        x1.astype(np.float32),
        x2.astype(np.float32),
        mask,
        R,
        t,
        n - n_outliers,
    )


def test_ransac_recovers_pose_with_outliers():
    x1, x2, mask, R, t, n_in = _synthetic_pair()
    res = estimate_relative_pose(x1, x2, mask, RansacConfig(num_iterations=256))
    assert int(res.num_inliers) >= 0.9 * n_in
    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    rot_err = np.degrees(np.arccos(np.clip((np.trace(R_est @ R.T) - 1) / 2, -1, 1)))
    assert rot_err < 0.5, rot_err
    t_err = np.degrees(np.arccos(np.clip(abs(t_est @ t), -1, 1)))
    assert t_err < 1.0, t_err
    # Translation sign (not just axis) must be right: cheirality resolved it.
    assert t_est @ t > 0


def test_ransac_with_noise():
    x1, x2, mask, R, t, n_in = _synthetic_pair(noise=1e-3, seed=2)
    cfg = RansacConfig(num_iterations=512, inlier_threshold=5e-3)
    res = estimate_relative_pose(x1, x2, mask, cfg)
    assert int(res.num_inliers) >= 0.8 * n_in
    R_est = np.asarray(res.R)
    rot_err = np.degrees(np.arccos(np.clip((np.trace(R_est @ R.T) - 1) / 2, -1, 1)))
    assert rot_err < 2.0, rot_err


def test_ransac_respects_mask():
    x1, x2, mask, R, t, n_in = _synthetic_pair(n_outliers=0, seed=3)
    mask[100:] = False  # only the first 100 correspondences are real matches
    res = estimate_relative_pose(x1, x2, mask)
    inl = np.asarray(res.inliers)
    assert not inl[100:].any()
    assert inl[:100].sum() >= 90


def test_triangulate_roundtrip():
    rng = np.random.default_rng(4)
    pts = rng.uniform([-1, -1, 3], [1, 1, 8], (50, 3))
    R = _rotmat([0, 1, 0], 0.1)
    t = np.array([0.3, 0.0, 0.0])
    x1 = (pts / pts[:, 2:3]).astype(np.float32)
    p2 = pts @ R.T + t
    x2 = (p2 / p2[:, 2:3]).astype(np.float32)
    X = np.asarray(triangulate(R.astype(np.float32), t.astype(np.float32), x1, x2))
    np.testing.assert_allclose(X, pts, rtol=1e-3, atol=1e-3)


def test_normalize_points():
    x = np.array([320.0, 0.0], np.float32)
    y = np.array([240.0, 0.0], np.float32)
    out = np.asarray(normalize_points(x, y, (500.0, 500.0, 320.0, 240.0)))
    np.testing.assert_allclose(out[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [-0.64, -0.48, 1.0], atol=1e-6)
