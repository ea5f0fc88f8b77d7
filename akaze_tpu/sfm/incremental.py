"""Mini incremental SfM: tracks -> two-view init -> PnP -> triangulate -> BA.

BASELINE.md config 5 driver.  Division of labor (SURVEY.md §5 long-context
row): the HOST owns the dynamic map bookkeeping (tracks, point-row
assignment, which keyframes see which tracks — cheap, O(tracks)); the
DEVICE owns every numeric solve on fixed-shape padded arrays.

TPU-first orchestration (round-2 redesign): the per-keyframe loop runs as
ONE jitted `lax.scan` super-step per BA window.  The host pre-schedules the
whole window — which point rows each keyframe's PnP reads, which rows each
consecutive pair triangulates — and the device scan resolves the
data-dependent parts (point validity, depth tests, PnP fallbacks) in-carry,
reproducing the sequential reference semantics without one RPC round trip
per keyframe.  Point rows are assigned by the host when a track is first
scheduled; a point becomes VALID only when the device's cheirality test
passes, and failed rows are automatically rescheduled at later pairs
(matching the retry behavior of the host-loop formulation).  Per window the
device sees: 1 super-step dispatch + 1 bundle-adjustment dispatch.
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
    """Single-pose refinement from 2D-3D correspondences (device IRLS-LM).

    pose6 (6,), points (N, 3), uv (N, 2) normalized, valid (N,).

    Round 4: the original plain Gauss-Newton (squared loss, no step
    guard) diverged on the 200-keyframe bench — a handful of bad map
    points (small-parallax triangulations) could yank the pose, and one
    divergent window cascaded the whole trajectory to NaN.  Now each
    iteration (a) Huber-downweights residuals (delta = 0.01 normalized
    units, ~10x the obs noise), (b) damps the normal equations, and (c)
    REJECTS steps that do not reduce the robust cost — so the refinement
    can never leave the warm start worse than it found it."""
    huber = jnp.float32(0.01)

    def residuals(p):
        r = rotvec_to_matrix(p[:3])
        xc = points @ r.T + p[3:]
        z = jnp.where(jnp.abs(xc[:, 2]) < 1e-9, 1e-9, xc[:, 2])
        res = jnp.stack([xc[:, 0] / z - uv[:, 0], xc[:, 1] / z - uv[:, 1]], -1)
        return (res * valid[:, None]).reshape(-1)

    def robust_w(r):
        """Per-correspondence Huber IRLS weights, expanded to residuals."""
        n = jnp.linalg.norm(r.reshape(-1, 2), axis=-1)
        w = jnp.minimum(1.0, huber / jnp.maximum(n, 1e-12))
        return jnp.repeat(w, 2)

    def cost(p):
        r = residuals(p)
        return jnp.sum(robust_w(r) * r * r)

    def step(state, _):
        p, c, lam = state
        r = residuals(p)
        w = robust_w(r)
        j = jax.jacfwd(residuals)(p)  # (2N, 6)
        jw = j * w[:, None]
        h = jw.T @ j + (lam + 1e-6) * jnp.eye(6)
        delta = -jnp.linalg.solve(h, jw.T @ r)
        cand = p + delta
        c_new = cost(cand)
        accept = jnp.isfinite(c_new) & (c_new < c)
        p = jnp.where(accept, cand, p)
        c = jnp.where(accept, c_new, c)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 9.0), 1e-8, 1e3)
        return (p, c, lam), None

    (pose6, _, _), _ = jax.lax.scan(
        step, (pose6, cost(pose6), jnp.float32(1e-5)), None,
        length=iterations,
    )
    return pose6


# --------------------------------------------------------------------------
# Device window super-step: scan over a window of keyframes, one dispatch.
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("pnp_iterations",))
def _window_superstep(
    poses: jax.Array,        # (K, 6)
    points: jax.Array,       # (Pcap+1, 3) — last row is the padding sentinel
    valid: jax.Array,        # (Pcap+1,) bool
    ks: jax.Array,           # (W,) i32 keyframe indices
    pnp_rows: jax.Array,     # (W, Npnp) i32 point rows (sentinel-padded)
    pnp_uv: jax.Array,       # (W, Npnp, 2)
    pnp_w: jax.Array,        # (W, Npnp) f32 1 for scheduled slots
    tri_rows: jax.Array,     # (W, Ntri) i32 rows to triangulate (sentinel-padded)
    tri_anc: jax.Array,      # (W, Ntri) i32 ANCHOR keyframe per pair
    tri_uva: jax.Array,      # (W, Ntri, 2) obs at the anchor keyframe
    tri_uvb: jax.Array,      # (W, Ntri, 2) obs at frame k
    tri_w: jax.Array,        # (W, Ntri) f32 1 for scheduled slots
    pnp_iterations: int = 10,
):
    """Sequential PnP + triangulation over a keyframe window, fully on device.

    Per step k: (1) PnP against currently-valid scheduled points (warm-started
    from pose k-1, branchless fallback to pose k-1 when under 6 usable
    correspondences); (2) midpoint-triangulate scheduled pairs from
    (anchor, k), marking rows valid on a parallax + both-view-depth test
    unless already valid.

    Round 5: the triangulation pair is (TRACK FIRST OBSERVATION, k), not
    (k-1, k).  Consecutive keyframes have ~0.15-unit baselines against
    6-14-unit depths (under 1 deg of parallax for forward motion), so at
    1e-3-rad observation noise the apparent noise parallax (~1.4e-3 rad)
    rivals the real signal and noise-depth points poisoned PnP — measured
    open-loop 200 kf ATE blew up 0.017 -> 3.6 going from 5e-4 to 1e-3
    noise.  Anchoring at the track head grows the baseline with track age
    (the host reschedules failed rows each window, so a young track simply
    triangulates a few frames later once its parallax clears the gate),
    which lets the gate sit at 1e-2 rad — 10x the noise floor — without
    starving the map."""

    def body(carry, inputs):
        poses, points, valid = carry
        k, rows, uv, w, trows, tanc, uva, uvb, tw = inputs
        # ---- PnP ----
        p3 = points[rows]
        wv = w * valid[rows].astype(jnp.float32)
        count = jnp.sum(wv)
        pose_prev = poses[k - 1]
        refined = refine_pose_pnp(pose_prev, p3, uv, wv, iterations=pnp_iterations)
        pose_k = jnp.where(count >= 6.0, refined, pose_prev)
        poses = poses.at[k].set(pose_k)
        # ---- triangulate scheduled tracks from (anchor, k) ----
        pa = poses[tanc]                       # (Ntri, 6) anchor poses
        ra = rotvec_to_matrix(pa[:, :3])       # (Ntri, 3, 3)
        rb = rotvec_to_matrix(pose_k[:3])
        r_rel = jnp.einsum("ij,nkj->nik", rb, ra)          # rb @ ra^T
        t_rel = pose_k[3:] - jnp.einsum("nij,nj->ni", r_rel, pa[:, 3:])
        ones = jnp.ones((*uva.shape[:-1], 1), uva.dtype)
        xa = jnp.concatenate([uva, ones], axis=-1)
        xb = jnp.concatenate([uvb, ones], axis=-1)
        local = jax.vmap(
            lambda rr, tt, a, b: triangulate(rr, tt, a[None], b[None])[0]
        )(r_rel, t_rel, xa, xb)                # (Ntri, 3) in anchor frames
        world = jnp.einsum(
            "nj,nji->ni", local - pa[:, 3:], ra
        )
        # Parallax gate: rotation-compensated ray angle must clear 1e-2 rad
        # (~0.57 deg) — near-zero-parallax pairs triangulate to wildly
        # wrong depths under observation noise, and those map points are
        # what breaks PnP on long trajectories.  Both-view positive depth
        # for the same reason.
        ray_a = xa / jnp.linalg.norm(xa, axis=-1, keepdims=True)
        ray_b = jnp.einsum("nj,nji->ni", xb, r_rel)  # cam_b ray, anchor axes
        ray_b = ray_b / jnp.linalg.norm(ray_b, axis=-1, keepdims=True)
        cosang = jnp.clip(jnp.sum(ray_a * ray_b, axis=-1), -1.0, 1.0)
        parallax_ok = cosang < jnp.float32(np.cos(1e-2))
        zb = (jnp.einsum("nij,nj->ni", r_rel, local) + t_rel)[:, 2]
        ok = (
            (local[:, 2] > 0) & (zb > 0) & parallax_ok
            & (tw > 0) & jnp.logical_not(valid[trows])
        )
        points = points.at[trows].set(
            jnp.where(ok[:, None], world, points[trows])
        )
        valid = valid.at[trows].set(valid[trows] | ok)
        return (poses, points, valid), None

    # f32 matmul precision (round 5): the TPU default runs the PnP jacfwd/
    # normal-equation products and the triangulation einsums in bf16 —
    # enough to DIVERGE the 200 kf loop bench on TPU (ATE 3.75) while the
    # identical CPU run measured 0.03.  Same rule as geometry/twoview.py;
    # these stages are tiny next to the front-end.
    with jax.default_matmul_precision("float32"):
        (poses, points, valid), _ = jax.lax.scan(
            body, (poses, points, valid),
            (ks, pnp_rows, pnp_uv, pnp_w, tri_rows, tri_anc, tri_uva,
             tri_uvb, tri_w),
        )
    return poses, points, valid


def _bucket(n: int, minimum: int = 64) -> int:
    return max(minimum, 1 << max(0, (n - 1)).bit_length())


def _apply_pose_graph(poses, num_kf, closures, iterations=12, sconfig=None):
    """Pose-graph optimization over odometry + loop-closure edges.

    Odometry edges carry the current incremental estimates (zero residual at
    init); closure edges carry the independently measured relative pose, so
    PGO distributes each closure's discrepancy around the loop.  Monocular
    closures have unit-scale translation — rescaled here to the current
    estimate's baseline norm (direction + rotation are the measurement).
    Edges are INFORMATION-WEIGHTED (round 5, SfmConfig.pgo_*_sigma): see
    PoseGraph's docstring — unweighted PGO let closure measurement noise
    increase ATE on low-drift trajectories.  Edge count is bucket-padded
    (valid-masked) for executable reuse."""
    from akaze_tpu.sfm.pose_graph import PoseGraph, optimize_pose_graph, relative

    sconfig = sconfig or SfmConfig()
    act = [c for c in closures if c[1] < num_kf]
    if not act:
        return poses, False
    poses_j = jnp.asarray(poses, jnp.float32)
    edges_i = list(range(1, num_kf))
    edges_j = list(range(0, num_kf - 1))
    # ONE batched relative() for all odometry edges, f32 matmuls: the
    # round-5 first cut looped 200 per-edge calls — 400 tiny TPU
    # dispatches over the tunnel, each running its 3x3 composes at the
    # bf16 matmul default, which injected ~3e-3-rad noise into every
    # odometry measurement (bigger than the closure noise it was
    # weighting against).
    with jax.default_matmul_precision("float32"):
        odo = np.asarray(
            relative(poses_j[1:num_kf], poses_j[: num_kf - 1]), np.float32
        )
        ci = np.asarray([c[0] for c in act], np.int32)
        cj = np.asarray([c[1] for c in act], np.int32)
        est = np.asarray(relative(poses_j[cj], poses_j[ci]), np.float32)
    rels = list(odo)
    for (i, j, rel6), est_e in zip(act, est):
        # i < j; edge measures cam_j-from-cam_i; monocular closures carry
        # unit-scale translation — rescale to the current baseline norm.
        rel6 = np.asarray(rel6, np.float32).copy()
        scale = float(np.linalg.norm(est_e[3:]))
        rel6[3:] *= max(scale, 1e-6)
        edges_i.append(int(j))
        edges_j.append(int(i))
        rels.append(rel6)
    e = len(edges_i)
    n_odo = num_kf - 1  # odometry edges precede closures in the lists
    ecap = _bucket(e, 16)
    K = len(poses)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    fixed[num_kf:] = True
    weights = np.zeros(ecap, np.float32)
    weights[:n_odo] = 1.0 / max(sconfig.pgo_odometry_sigma, 1e-9)
    weights[n_odo:e] = 1.0 / max(sconfig.pgo_closure_sigma, 1e-9)
    graph = PoseGraph(
        poses=jnp.asarray(poses, jnp.float32),
        edge_i=jnp.asarray(
            np.pad(np.asarray(edges_i, np.int32), (0, ecap - e))
        ),
        edge_j=jnp.asarray(
            np.pad(np.asarray(edges_j, np.int32), (0, ecap - e))
        ),
        rel=jnp.asarray(
            np.pad(np.asarray(rels, np.float32), ((0, ecap - e), (0, 0)))
        ),
        valid=jnp.asarray(np.arange(ecap) < e),
        fixed=jnp.asarray(fixed),
        weight=jnp.asarray(weights),
    )
    out = optimize_pose_graph(graph, iterations=iterations)
    return np.asarray(out.poses), True


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
    closures=None,
    pgo_iterations: int = 12,
    on_window=None,
) -> SfmResult:
    """Incremental SfM over tracked observations.

    observations: per-track dict {frame: uv (2,) normalized coords} (e.g.
    from build_tracks + keypoint lookup).  Frames are treated as keyframes
    0..num_frames-1.  Returns poses for every frame and the sparse map.

    closures: optional verified loop closures — `sfm.loop_closure.Closure`s
    or (i, j, rel6) tuples with i < j and rel6 the measured cam_j-from-cam_i
    [rotvec|t].  When a window reaches a closure's later keyframe, pose-graph
    optimization runs over odometry + closure edges and bundle adjustment
    re-polishes the map from the corrected poses (BASELINE.json config 5
    "distributed Schur-complement BA and pose-graph optimization").

    Elastic recovery (SURVEY.md §5): pass `checkpoint_path` to persist the
    map after every BA round; pass `resume` (an SfmCheckpoint) to restart
    from its `next_keyframe` — the per-window loop is idempotent, so a
    killed run resumes exactly where the last checkpoint left it.

    on_window: optional observability hook `f(k_end, poses, num_points)`
    called after each window's BA/checkpoint (progress reporting; the
    fault-injection test also uses it to pace the run it kills).
    """
    sconfig = sconfig or SfmConfig()
    rconfig = rconfig or RansacConfig()
    K = num_frames
    poses = np.zeros((K, 6), np.float32)
    closure_list: List[Tuple[int, int, np.ndarray]] = []
    for c in closures or []:
        if hasattr(c, "rel6"):
            closure_list.append((int(c.i), int(c.j), np.asarray(c.rel6, np.float32)))
        else:
            i, j, rel6 = c
            closure_list.append((int(i), int(j), np.asarray(rel6, np.float32)))

    # Dense point-row storage: host assigns rows, device decides validity.
    cap = 256
    points = np.zeros((cap, 3), np.float32)
    valid = np.zeros(cap, bool)
    next_row = 0
    assigned: Dict[int, int] = {}  # track -> row (valid or not yet)

    def ensure_capacity(n):
        nonlocal cap, points, valid
        if n <= cap:
            return
        new_cap = _bucket(n, cap)
        points = np.concatenate([points, np.zeros((new_cap - cap, 3), np.float32)])
        valid = np.concatenate([valid, np.zeros(new_cap - cap, bool)])
        cap = new_cap

    if resume is not None:
        if resume.next_keyframe > K:
            raise ValueError(
                f"checkpoint next_keyframe={resume.next_keyframe} exceeds "
                f"num_frames={K}; the resumed run must cover at least as many "
                "frames as the checkpointed one"
            )
        start_k = resume.next_keyframe
        n = min(resume.poses.shape[0], K)
        poses[:n] = resume.poses[:n]
        rp = np.asarray(resume.points, np.float32).reshape(-1, 3)
        ensure_capacity(len(rp))
        points[: len(rp)] = rp
        next_row = len(rp)
        assigned = dict(resume.track_point)
        for row in assigned.values():
            valid[row] = True
    else:
        # ---- two-view initialization: first pair (0, j) with real parallax.
        # A low-parallax pair leaves the essential matrix ill-conditioned
        # (measured on the synthetic benchmark: 1.1 deg median parallax gives
        # ~50 deg translation-direction error; >= 2 deg gives < 2 deg), so
        # scan forward until the median rotation-compensated bearing angle
        # clears a threshold, falling back to the widest pair seen. ----
        best = None
        for j in range(1, min(6, K)):
            pairs = [
                ti for ti, tr in enumerate(observations) if 0 in tr and j in tr
            ]
            if len(pairs) < 8:
                continue
            x1 = np.array(
                [np.append(observations[ti][0], 1.0) for ti in pairs], np.float32
            )
            x2 = np.array(
                [np.append(observations[ti][j], 1.0) for ti in pairs], np.float32
            )
            res = estimate_relative_pose(
                jnp.asarray(x1), jnp.asarray(x2),
                jnp.ones(len(pairs), bool), rconfig,
            )
            p1 = x1 / np.linalg.norm(x1, axis=1, keepdims=True)
            p2r = x2 @ np.asarray(res.R)
            p2r /= np.linalg.norm(p2r, axis=1, keepdims=True)
            med_parallax = float(np.degrees(np.median(
                np.arccos(np.clip(np.sum(p1 * p2r, axis=1), -1.0, 1.0))
            )))
            cand = (j, pairs, x1, x2, res, med_parallax)
            if best is None or med_parallax > best[5]:
                best = cand
            if med_parallax >= 2.0 and int(res.num_inliers) >= max(
                8, int(0.3 * len(pairs))
            ):
                best = cand
                break
        if best is None:
            raise ValueError(
                "two-view initialization failed: no early frame pair shares "
                ">=8 tracks with frame 0"
            )
        j_init, pairs, x1, x2, res, _ = best
        start_k = 1  # every frame >= 1 is PnP'd/refined by the window loop
        R = np.asarray(res.R)
        t = np.asarray(res.t)  # |t| = 1 fixes the gauge scale
        poses[0] = 0.0
        poses[j_init, :3] = np.asarray(matrix_to_rotvec(jnp.asarray(R)))
        poses[j_init, 3:] = t
        # Frames before j_init warm-start the window loop from the init pose
        # scaled linearly (PnP immediately refines them).
        for k in range(1, j_init):
            poses[k] = poses[j_init] * (k / j_init)

        # Map: triangulate the init inliers (f32 matmuls — the initial map
        # seeds everything downstream; see _window_superstep).
        inl = np.asarray(res.inliers)
        with jax.default_matmul_precision("float32"):
            pts3 = np.asarray(
                triangulate(
                    jnp.asarray(R), jnp.asarray(t),
                    jnp.asarray(x1), jnp.asarray(x2),
                )
            )
        good = inl & (pts3[:, 2] > 0)
        n_init = int(good.sum())
        ensure_capacity(n_init)
        for row, (ti, g) in enumerate(zip(pairs, good)):
            if g:
                assigned[ti] = next_row
                points[next_row] = pts3[row]
                valid[next_row] = True
                next_row += 1

    # Index tracks by frame once (host, O(total observations)).
    frame_tracks: List[List[int]] = [[] for _ in range(K)]
    for ti, tr in enumerate(observations):
        for f in tr:
            if f < K:
                frame_tracks[f].append(ti)

    # ---- window loop: each window = one device super-step + one BA ----
    k = start_k
    while k < K:
        k_end = k
        while k_end < K - 1 and not (k_end % ba_every == 0 and k_end >= k):
            k_end += 1
        window = list(range(k, k_end + 1))

        # Host scheduling: per keyframe, PnP rows + triangulation pairs.
        pnp_sched: List[List[Tuple[int, np.ndarray]]] = []
        tri_sched: List[List[Tuple[int, np.ndarray, np.ndarray]]] = []
        # Assignment time (window step index) for tracks assigned here.
        assign_step: Dict[int, int] = {}
        for wi, kk in enumerate(window):
            pnp_k = []
            for ti in frame_tracks[kk]:
                if ti in assigned and (
                    ti not in assign_step or assign_step[ti] < wi
                ):
                    pnp_k.append((assigned[ti], observations[ti][kk]))
            tri_k = []
            for ti in frame_tracks[kk]:
                tr = observations[ti]
                # Anchor = the track's FIRST keyframe (round 5): the
                # triangulation baseline grows with track age instead of
                # being pinned to one inter-keyframe step, so the device's
                # 1e-2-rad parallax gate can reject noise-parallax pairs
                # without starving the map (failed rows retry next window
                # with an even wider baseline).
                anchor = min(tr)
                if anchor >= kk:
                    continue
                if ti in assigned:
                    row = assigned[ti]
                    # Reschedule only failed rows (device skips valid ones).
                    if valid[row] or ti in assign_step:
                        if ti not in assign_step:
                            continue  # valid from a previous window
                        # assigned this window: retry at later pairs
                    tri_k.append((row, anchor, tr[anchor], tr[kk]))
                else:
                    ensure_capacity(next_row + 1)
                    assigned[ti] = next_row
                    assign_step[ti] = wi
                    tri_k.append((next_row, anchor, tr[anchor], tr[kk]))
                    next_row += 1
            pnp_sched.append(pnp_k)
            tri_sched.append(tri_k)

        W = len(window)
        n_pnp = _bucket(max((len(p) for p in pnp_sched), default=1))
        n_tri = _bucket(max((len(t) for t in tri_sched), default=1))
        pcap = _bucket(next_row, cap)
        ensure_capacity(pcap)
        sentinel = pcap  # device arrays get one extra padding row

        pnp_rows = np.full((W, n_pnp), sentinel, np.int32)
        pnp_uv = np.zeros((W, n_pnp, 2), np.float32)
        pnp_w = np.zeros((W, n_pnp), np.float32)
        tri_rows = np.full((W, n_tri), sentinel, np.int32)
        tri_anc = np.zeros((W, n_tri), np.int32)
        tri_uva = np.zeros((W, n_tri, 2), np.float32)
        tri_uvb = np.zeros((W, n_tri, 2), np.float32)
        tri_w = np.zeros((W, n_tri), np.float32)
        for wi in range(W):
            for s, (row, uv) in enumerate(pnp_sched[wi]):
                pnp_rows[wi, s] = row
                pnp_uv[wi, s] = uv
                pnp_w[wi, s] = 1.0
            for s, (row, anchor, uva, uvb) in enumerate(tri_sched[wi]):
                tri_rows[wi, s] = row
                tri_anc[wi, s] = anchor
                tri_uva[wi, s] = uva
                tri_uvb[wi, s] = uvb
                tri_w[wi, s] = 1.0

        dev_points = np.concatenate(
            [points[:pcap], np.zeros((1, 3), np.float32)]
        )
        dev_valid = np.concatenate([valid[:pcap], np.zeros(1, bool)])
        out_poses, out_points, out_valid = _window_superstep(
            jnp.asarray(poses), jnp.asarray(dev_points), jnp.asarray(dev_valid),
            jnp.asarray(np.asarray(window, np.int32)),
            jnp.asarray(pnp_rows), jnp.asarray(pnp_uv), jnp.asarray(pnp_w),
            jnp.asarray(tri_rows), jnp.asarray(tri_anc), jnp.asarray(tri_uva),
            jnp.asarray(tri_uvb), jnp.asarray(tri_w),
        )
        poses = np.asarray(out_poses)
        points[:pcap] = np.asarray(out_points[:pcap])
        valid[:pcap] = np.asarray(out_valid[:pcap])

        # ---- bundle adjustment over everything so far ----
        track_point = {
            ti: row for ti, row in assigned.items() if valid[row]
        }
        if next_row >= 8:
            poses, new_pts = _run_ba(
                poses, points[:next_row], observations, track_point,
                k_end + 1, sconfig, mesh,
            )
            points[:next_row] = new_pts
            # Pose-graph optimization when this window reached a closure's
            # later keyframe; BA then re-polishes from the corrected poses.
            if any(k <= cj <= k_end for _, cj, _ in closure_list):
                poses, applied = _apply_pose_graph(
                    poses, k_end + 1, closure_list, pgo_iterations, sconfig
                )
                if applied:
                    poses, new_pts = _run_ba(
                        poses, points[:next_row], observations, track_point,
                        k_end + 1, sconfig, mesh,
                    )
                    points[:next_row] = new_pts
            if checkpoint_path is not None:
                from akaze_tpu.sfm.checkpoint import SfmCheckpoint, save_checkpoint

                save_checkpoint(
                    checkpoint_path,
                    SfmCheckpoint(
                        poses=poses, points=points[:next_row].copy(),
                        track_point=track_point,
                        keyframe_frames=list(range(k_end + 1)),
                        next_keyframe=k_end + 1,
                    ),
                )
        if on_window is not None:
            on_window(k_end, poses, next_row)
        k = k_end + 1

    track_point = {ti: row for ti, row in assigned.items() if valid[row]}
    return SfmResult(
        poses=poses, points=points[:next_row].copy(),
        keyframe_frames=list(range(K)), track_point=track_point,
    )


def _run_ba(poses, points, observations, track_point, num_kf, sconfig, mesh):
    """Pack the current map into a fixed-shape BAProblem and optimize.

    `points` is the dense (P, 3) row array (rows without a valid track get
    no observations and are left untouched by the damped solver)."""
    P = len(points)
    Q = max(2, min(sconfig.ba_obs_per_point, num_kf))
    obs_cam = np.zeros((P, Q), np.int32)
    obs_uv = np.zeros((P, Q, 2), np.float32)
    obs_valid = np.zeros((P, Q), bool)
    for ti, row in track_point.items():
        tr = observations[ti]
        frames = [f for f in sorted(tr) if f < num_kf]
        # Q observations SPREAD evenly across the track (always including
        # its first and last visible keyframe), not the Q earliest (round
        # 4): earliest-only froze every point's geometry to a short early
        # window, so later cameras PnP'd against stale structure and scale
        # drift compounded down the trajectory (the 200 kf divergence).
        # The spread keeps the long-baseline constraints in the problem at
        # the same O(Q) cost.
        if len(frames) > Q:
            idx = np.round(np.linspace(0, len(frames) - 1, Q)).astype(int)
            frames = [frames[i] for i in dict.fromkeys(idx)]
        for q, f in enumerate(frames):
            obs_cam[row, q] = f
            obs_uv[row, q] = tr[f]
            obs_valid[row, q] = True
    fixed = np.zeros(len(poses), bool)
    # Gauge: pose 0 pins the frame (6 dof).  The monocular scale gauge is
    # left to LM damping rather than freezing pose 1 — a frozen pose 1
    # permanently bakes any two-view init error into the map (round-2
    # finding), while the near-null scale direction only drifts at the
    # damping scale and all trajectory metrics are scale-aligned anyway.
    fixed[0] = True
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
    return np.array(out.poses), np.array(out.points)[:P]
