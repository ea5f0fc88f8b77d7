"""Mini incremental SfM: tracks -> two-view init -> PnP -> triangulate -> BA.

BASELINE.md config 5 driver.  Division of labor (SURVEY.md §5 long-context
row): the HOST owns the dynamic map bookkeeping (tracks, which points exist,
which keyframes see them — cheap, O(tracks)); the DEVICE owns every numeric
solve on fixed-shape padded arrays: essential-matrix RANSAC (geometry/
twoview), single-pose PnP refinement, midpoint triangulation, and the
Schur-complement bundle adjustment (sfm/ba, optionally sharded over a mesh).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import RansacConfig, SfmConfig
from akaze_tpu.geometry.twoview import estimate_relative_pose, triangulate
from akaze_tpu.sfm.ba import BAProblem, bundle_adjust, bundle_adjust_sharded
from akaze_tpu.sfm.rotations import matrix_to_rotvec, rotvec_to_matrix


def build_tracks(matches_ab: List[np.ndarray], num_frames: int) -> List[Dict[int, int]]:
    """Chain consecutive-frame matches into tracks.

    matches_ab[t]: (M_t, 2) int array matching frame t keypoints (col 0) to
    frame t+1 keypoints (col 1).  Returns a list of tracks, each a dict
    {frame_index: keypoint_index}.
    """
    track_of: Dict[Tuple[int, int], int] = {}
    tracks: List[Dict[int, int]] = []
    for t, m in enumerate(matches_ab):
        for a, b in np.asarray(m):
            key = (t, int(a))
            if key in track_of:
                ti = track_of[key]
            else:
                ti = len(tracks)
                tracks.append({t: int(a)})
                track_of[key] = ti
            tracks[ti][t + 1] = int(b)
            track_of[(t + 1, int(b))] = ti
    return [tr for tr in tracks if len(tr) >= 2]


@functools.partial(jax.jit, static_argnames=("iterations",))
def refine_pose_pnp(
    pose6: jax.Array, points: jax.Array, uv: jax.Array, valid: jax.Array,
    iterations: int = 10,
) -> jax.Array:
    """Single-pose refinement from 2D-3D correspondences (device LM).

    pose6 (6,), points (N, 3), uv (N, 2) normalized, valid (N,)."""

    def residuals(p):
        r = rotvec_to_matrix(p[:3])
        xc = points @ r.T + p[3:]
        z = jnp.where(jnp.abs(xc[:, 2]) < 1e-9, 1e-9, xc[:, 2])
        res = jnp.stack([xc[:, 0] / z - uv[:, 0], xc[:, 1] / z - uv[:, 1]], -1)
        return (res * valid[:, None]).reshape(-1)

    def step(p, _):
        r = residuals(p)
        j = jax.jacfwd(residuals)(p)  # (2N, 6)
        h = j.T @ j + 1e-6 * jnp.eye(6)
        delta = -jnp.linalg.solve(h, j.T @ r)
        return p + delta, jnp.sum(r * r)

    pose6, _ = jax.lax.scan(step, pose6, None, length=iterations)
    return pose6


@dataclasses.dataclass
class SfmResult:
    poses: np.ndarray  # (K, 6) camera-from-world per keyframe
    points: np.ndarray  # (P, 3)
    keyframe_frames: List[int]  # original frame index per keyframe
    track_point: Dict[int, int]  # track index -> point row


def run_incremental(
    observations: List[Dict[int, np.ndarray]],
    num_frames: int,
    sconfig: SfmConfig | None = None,
    rconfig: RansacConfig | None = None,
    mesh=None,
    ba_every: int = 4,
    resume=None,
    checkpoint_path=None,
) -> SfmResult:
    """Incremental SfM over tracked observations.

    observations: per-track dict {frame: uv (2,) normalized coords} (e.g.
    from build_tracks + keypoint lookup).  Frames are treated as keyframes
    0..num_frames-1.  Returns poses for every frame and the sparse map.

    Elastic recovery (SURVEY.md §5): pass `checkpoint_path` to persist the
    map after every BA round; pass `resume` (an SfmCheckpoint) to restart
    from its `next_keyframe` — the per-keyframe loop is idempotent, so a
    killed run resumes exactly where the last checkpoint left it.
    """
    sconfig = sconfig or SfmConfig()
    rconfig = rconfig or RansacConfig()
    K = num_frames
    poses = np.zeros((K, 6), np.float32)
    have_pose = np.zeros(K, bool)

    if resume is not None:
        start_k = resume.next_keyframe
        kres = resume.poses.shape[0]
        poses[:kres] = resume.poses[:K]
        have_pose[:min(start_k, K)] = True
        points = [p.astype(np.float32) for p in np.asarray(resume.points)]
        track_point = dict(resume.track_point)
    else:
        start_k = 2
        # ---- two-view initialization from frames 0 and 1 ----
        t0, t1 = 0, 1
        pairs = [tr for tr in observations if t0 in tr and t1 in tr]
        x1 = np.array([np.append(tr[t0], 1.0) for tr in pairs], np.float32)
        x2 = np.array([np.append(tr[t1], 1.0) for tr in pairs], np.float32)
        res = estimate_relative_pose(
            jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(pairs), bool), rconfig
        )
        R = np.asarray(res.R)
        t = np.asarray(res.t)  # |t| = 1 fixes the gauge scale
        poses[t0] = 0.0
        poses[t1, :3] = np.asarray(matrix_to_rotvec(jnp.asarray(R)))
        poses[t1, 3:] = t
        have_pose[[t0, t1]] = True

        # Map: triangulate the init inliers.
        inl = np.asarray(res.inliers)
        pts3 = np.asarray(
            triangulate(jnp.asarray(R), jnp.asarray(t), jnp.asarray(x1), jnp.asarray(x2))
        )
        track_point: Dict[int, int] = {}
        points: List[np.ndarray] = []
        track_ids = [i for i, tr in enumerate(observations) if t0 in tr and t1 in tr]
        for row, ti in enumerate(track_ids):
            if inl[row] and pts3[row, 2] > 0:
                track_point[ti] = len(points)
                points.append(pts3[row])

    # ---- incremental loop over the remaining keyframes ----
    for k in range(start_k, K):
        # 2D-3D correspondences from tracks with existing points.
        ids = [
            ti for ti, tr in enumerate(observations)
            if k in tr and ti in track_point
        ]
        if len(ids) >= 6:
            p3 = np.array([points[track_point[ti]] for ti in ids], np.float32)
            uv = np.array([observations[ti][k] for ti in ids], np.float32)
            # Bucket-pad (zero-weight) so repeated PnP calls share compiles.
            n = len(ids)
            bucket = max(64, 1 << (n - 1).bit_length())
            w = np.zeros(bucket, np.float32)
            w[:n] = 1.0
            p3 = np.pad(p3, ((0, bucket - n), (0, 0)), constant_values=1.0)
            uv = np.pad(uv, ((0, bucket - n), (0, 0)))
            pose0 = poses[k - 1]  # warm start from the previous keyframe
            poses[k] = np.asarray(
                refine_pose_pnp(
                    jnp.asarray(pose0), jnp.asarray(p3), jnp.asarray(uv),
                    jnp.asarray(w),
                )
            )
            have_pose[k] = True
        else:  # fall back to chaining the previous pose
            poses[k] = poses[k - 1]
            have_pose[k] = True

        # Triangulate new tracks seen from (k-1, k).
        new_ids = [
            ti for ti, tr in enumerate(observations)
            if k in tr and (k - 1) in tr and ti not in track_point
        ]
        if new_ids:
            xa = np.array(
                [np.append(observations[ti][k - 1], 1.0) for ti in new_ids],
                np.float32,
            )
            xb = np.array(
                [np.append(observations[ti][k], 1.0) for ti in new_ids], np.float32
            )
            # Relative pose (cam_k from cam_{k-1}).
            ra = np.asarray(rotvec_to_matrix(jnp.asarray(poses[k - 1, :3])))
            rb = np.asarray(rotvec_to_matrix(jnp.asarray(poses[k, :3])))
            r_rel = rb @ ra.T
            t_rel = poses[k, 3:] - r_rel @ poses[k - 1, 3:]
            local = np.asarray(
                triangulate(
                    jnp.asarray(r_rel, jnp.float32), jnp.asarray(t_rel, jnp.float32),
                    jnp.asarray(xa), jnp.asarray(xb),
                )
            )
            # cam_{k-1} frame -> world: X_w = R_a^T (X_c - t_a)
            world = (local - poses[k - 1, 3:]) @ ra
            depth_ok = local[:, 2] > 0
            for row, ti in enumerate(new_ids):
                if depth_ok[row]:
                    track_point[ti] = len(points)
                    points.append(world[row].astype(np.float32))

        # Periodic bundle adjustment over everything so far.
        if (k % ba_every == 0 or k == K - 1) and len(points) >= 8:
            poses, points = _run_ba(
                poses, points, observations, track_point, k + 1, sconfig, mesh
            )
            if checkpoint_path is not None:
                from akaze_tpu.sfm.checkpoint import SfmCheckpoint, save_checkpoint

                save_checkpoint(
                    checkpoint_path,
                    SfmCheckpoint(
                        poses=poses, points=np.asarray(points),
                        track_point=track_point,
                        keyframe_frames=list(range(k + 1)),
                        next_keyframe=k + 1,
                    ),
                )

    return SfmResult(
        poses=poses, points=np.asarray(points),
        keyframe_frames=list(range(K)), track_point=track_point,
    )


def _run_ba(poses, points, observations, track_point, num_kf, sconfig, mesh):
    """Pack the current map into a fixed-shape BAProblem and optimize."""
    P = len(points)
    Q = max(2, min(8, num_kf))
    obs_cam = np.zeros((P, Q), np.int32)
    obs_uv = np.zeros((P, Q, 2), np.float32)
    obs_valid = np.zeros((P, Q), bool)
    for ti, row in track_point.items():
        tr = observations[ti]
        q = 0
        for f, uv in sorted(tr.items()):
            if f < num_kf and q < Q:
                obs_cam[row, q] = f
                obs_uv[row, q] = uv
                obs_valid[row, q] = True
                q += 1
    fixed = np.zeros(len(poses), bool)
    fixed[0] = True
    fixed[1] = True  # gauge: origin + scale
    fixed[num_kf:] = True  # untouched future slots
    # Bucket-pad the point count (next power of two) so the growing map
    # reuses compiled BA executables instead of recompiling every call,
    # and round up to the mesh size for sharding.
    bucket = max(64, 1 << (P - 1).bit_length())
    if mesh is not None:
        n = int(np.prod([d for d in mesh.devices.shape]))
        bucket = ((bucket + n - 1) // n) * n
    pad = bucket - P
    if pad:
        obs_cam = np.pad(obs_cam, ((0, pad), (0, 0)))
        obs_uv = np.pad(obs_uv, ((0, pad), (0, 0), (0, 0)))
        obs_valid = np.pad(obs_valid, ((0, pad), (0, 0)))
    pts_arr = np.asarray(points, np.float32)
    if pad:
        pts_arr = np.pad(pts_arr, ((0, pad), (0, 0)))
    problem = BAProblem(
        poses=jnp.asarray(poses, jnp.float32),
        points=jnp.asarray(pts_arr),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.asarray(obs_valid),
        fixed=jnp.asarray(fixed),
    )
    out = (
        bundle_adjust_sharded(problem, sconfig, mesh)
        if mesh is not None
        else bundle_adjust(problem, sconfig)
    )
    new_points = np.array(out.points)[:P]
    return np.array(out.poses), [new_points[i] for i in range(P)]
