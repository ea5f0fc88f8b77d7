"""Incremental SfM + pose graph tests on synthetic 3D scenes with ground
truth trajectories (BASELINE.md config 5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from akaze_tpu.core.config import RansacConfig, SfmConfig
from akaze_tpu.sfm.incremental import build_tracks, refine_pose_pnp, run_incremental
from akaze_tpu.sfm.metrics import ate_rmse, camera_centers
from akaze_tpu.sfm.pose_graph import PoseGraph, optimize_pose_graph, relative
from akaze_tpu.sfm.rotations import matrix_to_rotvec, rotvec_to_matrix


def _synthetic_sequence(K=12, n_pts=300, noise=0.0, seed=0):
    """Camera arc around a cloud; per-track normalized observations."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-3, -2, 8], [3, 2, 16], (n_pts, 3))
    poses = np.zeros((K, 6), np.float32)
    for k in range(K):
        poses[k, :3] = [0.0, 0.04 * k, 0.005 * k]
        poses[k, 3:] = [-0.35 * k, 0.01 * k, 0.05 * k]
    observations = []
    for p in range(n_pts):
        tr = {}
        for k in range(K):
            r = np.asarray(rotvec_to_matrix(jnp.asarray(poses[k, :3])))
            xc = r @ pts[p] + poses[k, 3:]
            if xc[2] <= 0.1:
                continue
            uv = xc[:2] / xc[2] + rng.normal(0, noise, 2)
            if np.abs(uv).max() < 0.6:  # field of view
                tr[k] = uv.astype(np.float32)
        if len(tr) >= 2:
            observations.append(tr)
    return observations, poses, pts


def test_build_tracks():
    matches = [
        np.array([[0, 1], [2, 3]]),  # frame0 -> frame1
        np.array([[1, 5], [7, 8]]),  # frame1 -> frame2
    ]
    tracks = build_tracks(matches, 3)
    # kp0@f0 -> kp1@f1 -> kp5@f2 chains into one track.
    chained = [t for t in tracks if len(t) == 3]
    assert len(chained) == 1
    assert chained[0] == {0: 0, 1: 1, 2: 5}
    assert len(tracks) == 3


def test_pnp_refinement():
    rng = np.random.default_rng(1)
    pts = rng.uniform([-2, -2, 5], [2, 2, 10], (50, 3)).astype(np.float32)
    gt = np.array([0.1, -0.05, 0.02, 0.3, -0.1, 0.2], np.float32)
    r = np.asarray(rotvec_to_matrix(jnp.asarray(gt[:3])))
    xc = pts @ r.T + gt[3:]
    uv = (xc[:, :2] / xc[:, 2:3]).astype(np.float32)
    pose = refine_pose_pnp(
        jnp.zeros(6), jnp.asarray(pts), jnp.asarray(uv), jnp.ones(50)
    )
    np.testing.assert_allclose(np.asarray(pose), gt, atol=1e-4)


def test_incremental_sfm_ate():
    observations, gt_poses, _ = _synthetic_sequence(K=10, noise=5e-4, seed=2)
    res = run_incremental(
        observations, 10, SfmConfig(ba_iterations=8),
        RansacConfig(num_iterations=256, inlier_threshold=5e-3),
    )
    est_c = camera_centers(res.poses)
    gt_c = camera_centers(gt_poses)
    ate = ate_rmse(est_c, gt_c)
    # Trajectory spans ~3.5 units; monocular-scale-aligned ATE must be small.
    assert ate < 0.05, ate
    assert len(res.points) > 100


def test_incremental_sfm_sharded_ba():
    from akaze_tpu.parallel.mesh import make_mesh

    observations, gt_poses, _ = _synthetic_sequence(K=6, seed=3)
    res = run_incremental(
        observations, 6, SfmConfig(ba_iterations=6),
        RansacConfig(num_iterations=128, inlier_threshold=5e-3),
        mesh=make_mesh(8),
    )
    ate = ate_rmse(camera_centers(res.poses), camera_centers(gt_poses))
    assert ate < 0.05, ate


def test_pose_graph_closes_drift():
    K = 8
    gt = np.zeros((K, 6), np.float32)
    for k in range(K):
        gt[k, :3] = [0, 0.1 * k, 0]
        gt[k, 3:] = [-0.5 * k, 0, 0.05 * k]
    gt_j = jnp.asarray(gt)
    # Odometry edges (sequential) + one loop closure 0 -> K-1, exact
    # measurements but drifted initialization.
    edges_i, edges_j, rels = [], [], []
    for k in range(K - 1):
        edges_i.append(k + 1)
        edges_j.append(k)
        rels.append(np.asarray(relative(gt_j[k + 1], gt_j[k])))
    edges_i.append(K - 1)
    edges_j.append(0)
    rels.append(np.asarray(relative(gt_j[K - 1], gt_j[0])))
    rng = np.random.default_rng(4)
    init = gt + rng.normal(0, 0.03, gt.shape).astype(np.float32)
    init[0] = gt[0]
    fixed = np.zeros(K, bool)
    fixed[0] = True
    graph = PoseGraph(
        poses=jnp.asarray(init),
        edge_i=jnp.asarray(edges_i, jnp.int32),
        edge_j=jnp.asarray(edges_j, jnp.int32),
        rel=jnp.asarray(np.array(rels), jnp.float32),
        valid=jnp.ones(len(edges_i), bool),
        fixed=jnp.asarray(fixed),
    )
    out = optimize_pose_graph(graph, iterations=15)
    err = np.abs(np.asarray(out.poses) - gt).max()
    assert err < 1e-3, err
