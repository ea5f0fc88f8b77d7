"""Stage pipelining (PP): 2-stage extract|match pipeline over a `stage`
mesh axis must reproduce the sequential front-end's match counts."""

import numpy as np

import jax

from akaze_tpu.core.config import AkazeConfig, MatchConfig
from akaze_tpu.frontend.pipeline import extract_batch
from akaze_tpu.matching.hamming import match
from akaze_tpu.parallel.pipeline_stage import make_stage_mesh, pipelined_match_counts
from akaze_tpu.utils.synthetic import video_sequence


def test_pipelined_counts_match_sequential():
    frames = video_sequence(6, 96, 128, seed=3)
    cfg = AkazeConfig(max_keypoints=128, per_level_candidates=32,
                      detector_threshold=1e-4)
    mcfg = MatchConfig(max_distance=120)

    mesh = make_stage_mesh(jax.devices()[:2])
    got = pipelined_match_counts(frames, mesh, cfg, mcfg, microbatch=2)

    feats = extract_batch(frames, cfg)
    want = [0]
    for t in range(1, len(frames)):
        m = match(
            feats.descriptors[t - 1], feats.keypoints.valid[t - 1],
            feats.descriptors[t], feats.keypoints.valid[t], mcfg,
        )
        want.append(int(m.count()))
    np.testing.assert_array_equal(got, np.asarray(want))
