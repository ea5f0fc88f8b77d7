"""Two-view pose error gates against the recorded reference bound
(BASELINE.md round 2: golden-model pipeline on the multi-plane benchmark
measured rot <= 0.70 deg / t-dir <= 3.63 deg over seeds 5-8; recorded bound
with margin: rot <= 1.5 deg, t-dir <= 6.0 deg)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akaze_tpu.core.config import MatchConfig, RansacConfig
from akaze_tpu.frontend.pipeline import extract_batch
from akaze_tpu.geometry.twoview import estimate_relative_pose, normalize_points
from akaze_tpu.matching.hamming import match_features
from akaze_tpu.utils.synthetic import multi_plane_pair

ROT_BOUND_DEG = 1.5
TDIR_BOUND_DEG = 6.0


def _pose_errors(R_est, t_est, R_gt, t_gt):
    rot = np.degrees(
        np.arccos(np.clip((np.trace(R_est @ R_gt.T) - 1) / 2, -1, 1))
    )
    tdir = np.degrees(np.arccos(np.clip(abs(t_est @ t_gt), -1, 1)))
    return rot, tdir


@pytest.mark.parametrize("seed", [5, 6, 7, 8])
def test_device_two_view_within_reference_bound(seed):
    img_a, img_b, R_gt, t_gt, intr = multi_plane_pair(seed=seed)
    feats = extract_batch(np.stack([img_a, img_b]))
    mm = match_features(
        jax.tree.map(lambda x: x[0], feats), jax.tree.map(lambda x: x[1], feats)
    )
    kp = feats.keypoints
    x1 = normalize_points(kp.x[0], kp.y[0], intr)
    x2 = normalize_points(kp.x[1][mm.idx_b], kp.y[1][mm.idx_b], intr)
    res = estimate_relative_pose(
        x1, x2, mm.accepted,
        RansacConfig(num_iterations=512, inlier_threshold=2e-3),
    )
    rot, tdir = _pose_errors(np.asarray(res.R), np.asarray(res.t), R_gt, t_gt)
    assert rot <= ROT_BOUND_DEG, (seed, rot)
    assert tdir <= TDIR_BOUND_DEG, (seed, tdir)
    assert int(res.num_inliers) >= 30


def test_golden_two_view_establishes_bound():
    """Keeps the recorded bound honest: the golden pipeline on one benchmark
    seed must reproduce the accuracy BASELINE.md records (one seed only —
    the golden extractor costs ~15 s/frame)."""
    from akaze_tpu.golden import akaze as golden
    from akaze_tpu.golden import matching as gmatch

    img_a, img_b, R_gt, t_gt, intr = multi_plane_pair(seed=6)
    ra, rb = golden.extract(img_a), golden.extract(img_b)
    m = gmatch.match(ra.descriptors_u32, rb.descriptors_u32, MatchConfig())
    ax = np.array([ra.keypoints[i].x for i, _ in m], np.float32)
    ay = np.array([ra.keypoints[i].y for i, _ in m], np.float32)
    bx = np.array([rb.keypoints[j].x for _, j in m], np.float32)
    by = np.array([rb.keypoints[j].y for _, j in m], np.float32)
    x1 = normalize_points(jnp.asarray(ax), jnp.asarray(ay), intr)
    x2 = normalize_points(jnp.asarray(bx), jnp.asarray(by), intr)
    res = estimate_relative_pose(
        x1, x2, jnp.ones(len(m), bool),
        RansacConfig(num_iterations=512, inlier_threshold=2e-3),
    )
    rot, tdir = _pose_errors(np.asarray(res.R), np.asarray(res.t), R_gt, t_gt)
    assert rot <= ROT_BOUND_DEG and tdir <= TDIR_BOUND_DEG, (rot, tdir)
