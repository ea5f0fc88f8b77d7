"""Elastic recovery (SURVEY.md §5): kill an SfM run mid-way, resume from the
checkpoint, and land on (nearly) the same trajectory as the uninterrupted run.

The 'failure' is simulated by running the incremental loop only up to a
checkpoint and constructing a fresh run from the persisted state — the same
code path a respawned host takes after `jax.distributed` re-initialization.
"""

import numpy as np

from akaze_tpu.core.config import RansacConfig, SfmConfig
from akaze_tpu.sfm.checkpoint import load_checkpoint
from akaze_tpu.sfm.incremental import run_incremental
from akaze_tpu.sfm.metrics import ate_rmse, camera_centers
from tests.test_sfm import _synthetic_sequence


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    observations, gt_poses, _ = _synthetic_sequence(K=10, noise=5e-4, seed=7)
    scfg = SfmConfig(ba_iterations=8)
    rcfg = RansacConfig(num_iterations=256, inlier_threshold=5e-3)

    full = run_incremental(observations, 10, scfg, rcfg, ba_every=4)

    # "Crashed" run: process only the first 9 keyframes (checkpoint written
    # after the BA at k=8), then resume from disk for the rest.
    ckpt_path = tmp_path / "map.npz"
    run_incremental(
        observations, 9, scfg, rcfg, ba_every=4, checkpoint_path=str(ckpt_path)
    )
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt.next_keyframe == 9
    resumed = run_incremental(
        observations, 10, scfg, rcfg, ba_every=4, resume=ckpt
    )

    # The recovery property: the resumed run reproduces the uninterrupted
    # run (same map, same trajectory up to LM branch noise — the partial
    # run solves a K=9 problem where the full run solved K=10, and the LM
    # accept/reject path amplifies the tiny numeric difference).
    assert len(resumed.points) == len(full.points)
    np.testing.assert_allclose(resumed.poses, full.poses, atol=5e-2)
    gt_c = camera_centers(gt_poses)
    ate_full = ate_rmse(camera_centers(full.poses), gt_c)
    ate_resumed = ate_rmse(camera_centers(resumed.poses), gt_c)
    assert ate_resumed < ate_full + 0.02
