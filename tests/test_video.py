"""Video front-end: batched extraction + sequential matching + keyframes
(BASELINE.md config 4), on a small synthetic panning sequence."""

import numpy as np

from akaze_tpu.core.config import AkazeConfig, SfmConfig
from akaze_tpu.matching.video import process_video
from akaze_tpu.utils.synthetic import video_sequence


def test_process_video():
    frames = video_sequence(10, 120, 160, seed=5)
    cfg = AkazeConfig(max_keypoints=256, per_level_candidates=64, detector_threshold=1e-4)
    res = process_video(frames, cfg, batch=4)
    assert res.features.keypoints.x.shape[0] == 10
    counts = res.match_counts
    assert counts[0] == 0
    # Consecutive frames of a slow pan share most features.
    assert (counts[1:] > 10).all(), counts
    assert res.keyframes[0] == 0
    assert all(0 <= k < 10 for k in res.keyframes)


def test_keyframes_on_cut():
    """A hard scene cut forces a new keyframe."""
    a = video_sequence(4, 120, 160, seed=5)
    # Mirrored different-seed scene: the synthetic generator's deterministic
    # checkerboard is shared across seeds, so flip to make a genuine cut.
    b = np.flip(video_sequence(4, 120, 160, seed=99), axis=(1, 2)).copy()
    frames = np.concatenate([a, b])
    cfg = AkazeConfig(max_keypoints=256, per_level_candidates=64, detector_threshold=1e-4)
    # The synthetic texture is self-similar and AKAZE is rotation-invariant,
    # so ~half the "matches" survive even across a cut; 0.7 separates the
    # genuine tracking regime (>1.0 here) from the cut (~0.57).
    res = process_video(frames, cfg, sconfig=SfmConfig(keyframe_min_tracked=0.7), batch=4)
    # The cut at t=4 must appear among the keyframes.
    assert 4 in res.keyframes, (res.keyframes, res.match_counts)
