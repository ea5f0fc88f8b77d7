"""Loop-closure detection over a keyframe database + track merging.

[SPEC] layer (BASELINE.json config 5 names "pose-graph optimization"; the
pose graph needs loop edges to be useful).  No reference counterpart — the
reference stops at two-image matching (SURVEY.md §3.4).

TPU-first shape: the keyframe database IS a batched descriptor tensor
(K, cap, words).  Candidate retrieval is brute-force pairwise matching of
every admissible keyframe pair — a `lax.map`-chunked vmap over the pair
list, ONE device dispatch for all counts (K <= ~100 keyframes, so the
G = O(K^2) pair list is small; each pair is the same fixed-shape
XOR+popcount matcher the front-end uses).  Geometric verification is the
existing fixed-iteration on-device RANSAC essential solve per candidate.

Outputs feed two consumers:
  * `merge_closure_tracks` unions matched keypoints into the track set so
    bundle adjustment sees the revisited points as the SAME 3D points;
  * `Closure.rel6` (cam_j-from-cam_i, unit-scale translation) becomes a
    pose-graph edge for `optimize_pose_graph` in sfm/incremental.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import MatchConfig, RansacConfig
from akaze_tpu.geometry.twoview import estimate_relative_pose, normalize_points
from akaze_tpu.matching.hamming import match_fn
from akaze_tpu.sfm.rotations import matrix_to_rotvec


@dataclasses.dataclass
class Closure:
    """A verified loop closure between keyframes i < j (frame indices)."""

    i: int
    j: int
    matches: np.ndarray  # (M, 2) keypoint indices: column 0 in i, 1 in j
    rel6: np.ndarray  # (6,) measured cam_j-from-cam_i [rotvec|t], |t| = 1
    num_inliers: int


@functools.lru_cache(maxsize=8)
def _compiled_pair_counts(mconfig: MatchConfig, chunk: int):
    @jax.jit
    def run(desc, valid, pairs):
        """desc (K, cap, W), valid (K, cap), pairs (G, 2) -> counts (G,)."""

        def one(pair):
            a, b = pair[0], pair[1]
            m = match_fn(desc[a], valid[a], desc[b], valid[b], mconfig)
            return m.count()

        return jax.lax.map(one, pairs, batch_size=chunk)

    return run


def pairwise_match_counts(
    desc, valid, pairs: np.ndarray, mconfig: MatchConfig | None = None,
    chunk: int = 32,
) -> np.ndarray:
    """Match counts for a list of keyframe index pairs, one device call.

    The pair list is bucket-padded (repeating the first pair) so varying
    keyframe counts reuse the compiled executable."""
    mconfig = mconfig or MatchConfig(max_distance=120)
    g = len(pairs)
    if g == 0:
        return np.zeros(0, np.int32)
    bucket = max(chunk, 1 << (g - 1).bit_length())
    padded = np.concatenate([pairs, np.repeat(pairs[:1], bucket - g, axis=0)])
    run = _compiled_pair_counts(mconfig, chunk)
    counts = run(
        jnp.asarray(desc), jnp.asarray(valid),
        jnp.asarray(padded.astype(np.int32)),
    )
    return np.asarray(counts)[:g]


def detect_loop_closures(
    features,
    keyframes: Sequence[int],
    intrinsics,
    mconfig: MatchConfig | None = None,
    rconfig: RansacConfig | None = None,
    min_gap: int = 8,
    min_matches: int = 60,
    min_inliers: int = 30,
) -> List[Closure]:
    """Match every admissible keyframe pair; RANSAC-verify the strong ones.

    features: Features with (T, cap) leaves (the video front-end output);
    keyframes: frame indices forming the database; intrinsics (fx, fy, cx,
    cy) to normalize pixel keypoints for the essential-matrix check."""
    mconfig = mconfig or MatchConfig(max_distance=120)
    rconfig = rconfig or RansacConfig(num_iterations=256, inlier_threshold=3e-3)
    kf = list(keyframes)
    pairs = np.array(
        [
            (kf[a], kf[b])
            for a in range(len(kf))
            for b in range(a + 1, len(kf))
            if kf[b] - kf[a] >= min_gap
        ],
        np.int64,
    ).reshape(-1, 2)
    counts = pairwise_match_counts(
        features.descriptors, features.keypoints.valid, pairs, mconfig
    )
    closures: List[Closure] = []
    for (fi, fj), c in zip(pairs, counts):
        if c < min_matches:
            continue
        m = match_fn(
            features.descriptors[fi], features.keypoints.valid[fi],
            features.descriptors[fj], features.keypoints.valid[fj],
            mconfig,
        )
        acc = np.asarray(m.accepted)
        idx_b = np.asarray(m.idx_b)
        rows = np.nonzero(acc)[0]
        x1 = normalize_points(
            features.keypoints.x[fi], features.keypoints.y[fi], intrinsics
        )
        x2 = normalize_points(
            features.keypoints.x[fj][m.idx_b],
            features.keypoints.y[fj][m.idx_b],
            intrinsics,
        )
        res = estimate_relative_pose(x1, x2, m.accepted, rconfig)
        n_inl = int(res.num_inliers)
        if n_inl < min_inliers:
            continue
        inl = np.asarray(res.inliers)
        match_idx = np.stack([rows, idx_b[rows]], axis=1)
        match_idx = match_idx[inl[rows]]
        rel6 = np.concatenate(
            [np.asarray(matrix_to_rotvec(res.R)), np.asarray(res.t)]
        ).astype(np.float32)
        closures.append(
            Closure(
                i=int(fi), j=int(fj), matches=match_idx, rel6=rel6,
                num_inliers=n_inl,
            )
        )
    return closures


def merge_closure_tracks(
    tracks: List[Dict[int, int]], closures: Sequence[Closure]
) -> List[Dict[int, int]]:
    """Union closure-matched keypoints into the consecutive-frame track set.

    After merging, a point revisited at a loop closure is ONE track observed
    from both visits, so triangulation/BA constrain the loop directly."""
    owner: Dict[tuple, int] = {}
    merged = [dict(tr) for tr in tracks]
    for ti, tr in enumerate(merged):
        for f, kp in tr.items():
            owner[(f, kp)] = ti

    def find(ti):  # path-compressed union-find over track indices
        root = ti
        while isinstance(merged[root], int):
            root = merged[root]
        while isinstance(merged[ti], int):
            merged[ti], ti = root, merged[ti]
        return root

    for cl in closures:
        for a, b in cl.matches:
            ka, kb = (cl.i, int(a)), (cl.j, int(b))
            ta = owner.get(ka)
            tb = owner.get(kb)
            if ta is not None:
                ta = find(ta)
            if tb is not None:
                tb = find(tb)
            if ta is None and tb is None:
                ti = len(merged)
                merged.append({cl.i: int(a), cl.j: int(b)})
                owner[ka] = owner[kb] = ti
            elif ta is None:
                merged[tb].setdefault(cl.i, int(a))
                owner[ka] = tb
            elif tb is None:
                merged[ta].setdefault(cl.j, int(b))
                owner[kb] = ta
            elif ta != tb:
                # Merge the smaller into the larger; existing frames win.
                if len(merged[ta]) < len(merged[tb]):
                    ta, tb = tb, ta
                for f, kp in merged[tb].items():
                    merged[ta].setdefault(f, kp)
                merged[tb] = ta  # tombstone -> union-find parent
    return [tr for tr in merged if isinstance(tr, dict) and len(tr) >= 2]
