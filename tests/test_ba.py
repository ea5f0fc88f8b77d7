"""Bundle adjustment tests: synthetic multi-view problems with ground truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akaze_tpu.core.config import SfmConfig
from akaze_tpu.sfm.ba import (
    BAProblem,
    bundle_adjust,
    bundle_adjust_sharded,
    reprojection_rmse,
)
from akaze_tpu.sfm.rotations import matrix_to_rotvec, rotvec_to_matrix


def _synthetic_problem(K=6, P=64, Q=4, noise=0.0, pose_err=0.05, pt_err=0.1, seed=0):
    """Cameras on an arc looking at a point cloud; perturbed initial state."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 6], [2, 2, 12], (P, 3))
    poses = np.zeros((K, 6))
    for k in range(K):
        angle = 0.05 * k
        poses[k, :3] = [0, angle, 0]
        poses[k, 3:] = [-0.4 * k, 0.02 * k, 0.1 * k]
    # Observation table: each point seen by Q consecutive cameras.
    obs_cam = np.zeros((P, Q), np.int32)
    obs_uv = np.zeros((P, Q, 2), np.float32)
    obs_valid = np.ones((P, Q), bool)
    for p in range(P):
        start = rng.integers(0, K - Q + 1)
        for q in range(Q):
            k = start + q
            r = rotvec_to_matrix(jnp.asarray(poses[k, :3]))
            xc = np.asarray(r) @ pts[p] + poses[k, 3:]
            obs_cam[p, q] = k
            obs_uv[p, q] = xc[:2] / xc[2] + rng.normal(0, noise, 2)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    fixed[1] = True  # full gauge: position + scale
    init_poses = poses.copy()
    init_pts = pts + rng.normal(0, pt_err, pts.shape)
    init_poses[2:, :] += rng.normal(0, pose_err, (K - 2, 6))
    problem = BAProblem(
        poses=jnp.asarray(init_poses, jnp.float32),
        points=jnp.asarray(init_pts, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.asarray(obs_valid),
        fixed=jnp.asarray(fixed),
    )
    return problem, poses, pts


def test_ba_converges():
    problem, gt_poses, gt_pts = _synthetic_problem()
    cfg = SfmConfig(ba_iterations=15)
    rmse0 = float(reprojection_rmse(problem))
    out = bundle_adjust(problem, cfg)
    rmse1 = float(reprojection_rmse(out))
    assert rmse1 < 1e-4, (rmse0, rmse1)
    # Poses recovered (noiseless observations -> near-exact).
    err = np.abs(np.asarray(out.poses) - gt_poses)
    assert err.max() < 1e-2, err.max()


def test_ba_with_noise_and_invalid_obs():
    problem, gt_poses, gt_pts = _synthetic_problem(noise=1e-3, seed=1)
    # Kill some observations; BA must ignore them.
    valid = np.asarray(problem.obs_valid).copy()
    valid[::7, 0] = False
    problem = BAProblem(
        poses=problem.poses, points=problem.points, obs_cam=problem.obs_cam,
        obs_uv=problem.obs_uv, obs_valid=jnp.asarray(valid), fixed=problem.fixed,
    )
    cfg = SfmConfig(ba_iterations=15)
    out = bundle_adjust(problem, cfg)
    rmse = float(reprojection_rmse(out))
    assert rmse < 5e-3, rmse


def test_ba_fixed_poses_do_not_move():
    problem, _, _ = _synthetic_problem(seed=2)
    out = bundle_adjust(problem, SfmConfig(ba_iterations=5))
    np.testing.assert_array_equal(
        np.asarray(out.poses)[:2], np.asarray(problem.poses)[:2]
    )


def test_ba_sharded_matches_single_device():
    from akaze_tpu.parallel.mesh import make_mesh

    problem, _, _ = _synthetic_problem(P=64, seed=3)
    cfg = SfmConfig(ba_iterations=8)
    single = bundle_adjust(problem, cfg)
    mesh = make_mesh(8)
    sharded = bundle_adjust_sharded(problem, cfg, mesh)
    # Same fixed-point math up to reduction order: poses agree tightly.
    np.testing.assert_allclose(
        np.asarray(sharded.poses), np.asarray(single.poses), atol=5e-4
    )
    rmse = float(reprojection_rmse(sharded))
    assert rmse < 1e-3, rmse


def _long_trajectory_problem(K=200, P=5000, Q=6, noise=5e-4,
                             pose_err=0.01, pt_err=0.05, seed=5):
    """Well-scaled long-trajectory problem (the small-K arc generator above
    degenerates past ~20 cameras: translations grow linearly and points
    leave the fields of view).  Cameras slide along x with a slow yaw;
    each point sits in front of the middle of its Q-camera window."""
    rng = np.random.default_rng(seed)
    poses = np.zeros((K, 6))
    for k in range(K):
        poses[k, :3] = [0.0, 0.003 * k, 0.0]
        poses[k, 3:] = [-0.15 * k, 0.01 * np.sin(0.1 * k), 0.0]
    starts = rng.integers(0, K - Q + 1, P)
    obs_cam = (starts[:, None] + np.arange(Q)[None, :]).astype(np.int32)
    pts = np.zeros((P, 3))
    obs_uv = np.zeros((P, Q, 2), np.float32)
    for p in range(P):
        mid = starts[p] + Q // 2
        r_mid = np.asarray(rotvec_to_matrix(jnp.asarray(poses[mid, :3])))
        depth = rng.uniform(6, 14)
        local = np.array([rng.uniform(-2, 2), rng.uniform(-1.5, 1.5), depth])
        pts[p] = r_mid.T @ (local - poses[mid, 3:])
        for q in range(Q):
            k = obs_cam[p, q]
            r = np.asarray(rotvec_to_matrix(jnp.asarray(poses[k, :3])))
            xc = r @ pts[p] + poses[k, 3:]
            obs_uv[p, q] = xc[:2] / xc[2] + rng.normal(0, noise, 2)
    fixed = np.zeros(K, bool)
    fixed[:2] = True
    init_poses = poses.copy()
    init_poses[2:] += rng.normal(0, pose_err, (K - 2, 6))
    init_pts = pts + rng.normal(0, pt_err, pts.shape)
    problem = BAProblem(
        poses=jnp.asarray(init_poses, jnp.float32),
        points=jnp.asarray(init_pts, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.ones((P, Q), bool),
        fixed=jnp.asarray(fixed),
    )
    return problem, poses, pts


def test_ba_200kf_cg_scale():
    """Round-3 verdict item 5: one order of magnitude up — 200 keyframes /
    5k points exercises the segment-sum Schur assembly and the
    block-Jacobi CG pose solve (K > 64 path)."""
    problem, gt_poses, _ = _long_trajectory_problem(K=200, P=5000)
    cfg = SfmConfig(ba_iterations=8)
    rmse0 = float(reprojection_rmse(problem))
    out = bundle_adjust(problem, cfg)
    rmse = float(reprojection_rmse(out))
    assert rmse < 2e-3, (rmse0, rmse)
    err = np.abs(np.asarray(out.poses) - gt_poses)
    assert err.max() < 0.1, err.max()  # absolute-pose drift over a 30-unit chain


def test_ba_200kf_sharded_matches_single():
    from akaze_tpu.parallel.mesh import make_mesh

    problem, _, _ = _long_trajectory_problem(K=200, P=2048, seed=6)
    cfg = SfmConfig(ba_iterations=4)
    single = bundle_adjust(problem, cfg)
    sharded = bundle_adjust_sharded(problem, cfg, make_mesh(8))
    np.testing.assert_allclose(
        np.asarray(sharded.poses), np.asarray(single.poses), atol=1e-3
    )


def test_rotvec_roundtrip():
    rng = np.random.default_rng(0)
    r = rng.normal(0, 1.0, (32, 3)).astype(np.float32)
    m = rotvec_to_matrix(jnp.asarray(r))
    # Orthonormality.
    eye = np.einsum("kij,kil->kjl", np.asarray(m), np.asarray(m))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    back = np.asarray(matrix_to_rotvec(m))
    np.testing.assert_allclose(back, r, atol=1e-4)
    # Small-angle path.
    small = jnp.asarray([[1e-9, 0, 0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rotvec_to_matrix(small))[0], np.eye(3), atol=1e-6
    )
