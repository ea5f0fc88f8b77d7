"""Two-view geometry: on-device RANSAC essential matrix, pose, triangulation.

The reference stops at descriptor matching; `[SPEC]` (SURVEY.md §3.4, §7.2
step 3) extends the rebuild with essential-matrix pose.  TPU-first design
(SURVEY.md §7.3 "On-device RANSAC"): a FIXED number of hypotheses evaluated
as one batched program — sample 8-tuples with `jax.random`, solve all
hypotheses with a batched SVD, score every hypothesis against every
correspondence with masked Sampson errors, `argmax` inlier count.  No early
exit, no dynamic shapes; invalid match slots simply carry zero weight.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from akaze_tpu.core.config import RansacConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TwoViewResult:
    """Essential matrix + relative pose (x2 ~ R @ x1 + t, |t| = 1)."""

    E: jax.Array  # f32 (3, 3)
    R: jax.Array  # f32 (3, 3)
    t: jax.Array  # f32 (3,)
    inliers: jax.Array  # bool (N,)
    num_inliers: jax.Array  # i32 scalar


def normalize_points(x: jax.Array, y: jax.Array, intrinsics) -> jax.Array:
    """Pixel -> normalized camera coords; intrinsics = (fx, fy, cx, cy).
    Returns homogeneous (N, 3)."""
    fx, fy, cx, cy = intrinsics
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)


def _essential_from_8pt(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Batched 8-point solve: x1, x2 (H, 8, 3) -> E (H, 3, 3) with the
    essential constraint (singular values 1, 1, 0) enforced."""
    a = jnp.einsum("hni,hnj->hnij", x2, x1).reshape(*x1.shape[:-2], 8, 9)
    # Nullspace via smallest right singular vector.
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    e = vt[..., -1, :].reshape(*x1.shape[:-2], 3, 3)
    u, _, vt = jnp.linalg.svd(e)
    s = jnp.asarray([1.0, 1.0, 0.0], e.dtype)
    return u @ (s[..., :, None] * vt)


def _sampson_sq(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Squared Sampson distance: E (..., 3, 3), x1/x2 (N, 3) -> (..., N)."""
    ex1 = jnp.einsum("...ij,nj->...ni", E, x1)
    etx2 = jnp.einsum("...ji,nj->...ni", E, x2)
    err = jnp.einsum("ni,...ni->...n", x2, ex1)
    denom = ex1[..., 0] ** 2 + ex1[..., 1] ** 2 + etx2[..., 0] ** 2 + etx2[..., 1] ** 2
    return err * err / jnp.maximum(denom, 1e-12)


def estimate_relative_pose_fn(
    x1: jax.Array,  # (N, 3) homogeneous normalized coords, frame 1
    x2: jax.Array,  # (N, 3) frame 2
    mask: jax.Array,  # (N,) valid correspondences
    key: jax.Array,
    config: RansacConfig,
) -> TwoViewResult:
    """Traceable RANSAC essential + cheirality-tested pose recovery.

    Traced under f32 matmul precision: TPU default precision runs the
    einsums AND the matmuls inside `jnp.linalg.svd`'s iterations in
    bfloat16, which blows the recovered rotation past its reference bound
    (measured round 2: 5.2 deg vs the 1.5 deg golden-model bound on the
    benchmark scenes; CPU f32 passes).  Geometry is tiny next to the
    front-end, so full-f32 MXU passes cost nothing measurable."""
    with jax.default_matmul_precision("float32"):
        return _estimate_relative_pose_f32(x1, x2, mask, key, config)


def _estimate_relative_pose_f32(
    x1: jax.Array,
    x2: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    config: RansacConfig,
) -> TwoViewResult:
    n = x1.shape[0]

    # --- hypotheses: distinct uniform 8-subsets of the valid slots ---
    # Per hypothesis, rank random scores and take the top sample_size: a
    # uniformly random subset with NO duplicate correspondences (independent
    # draws can repeat an index, yielding a degenerate 8-point system that
    # wastes the iteration — worst exactly when few matches survive).
    g = jax.random.uniform(key, (config.num_iterations, n))
    g = jnp.where(mask[None, :], g, -1.0)  # invalid slots rank last
    _, idx = jax.lax.top_k(g, config.sample_size)  # (H, sample_size)
    E_h = _essential_from_8pt(x1[idx], x2[idx])  # (H, 3, 3)

    # --- score all hypotheses against all correspondences ---
    thr2 = jnp.float32(config.inlier_threshold**2)
    inl_h = (_sampson_sq(E_h, x1, x2) < thr2) & mask[None, :]  # (H, N)
    scores = jnp.sum(inl_h, axis=-1)
    best = jnp.argmax(scores)

    # --- guarded iterated refit (LO-RANSAC style) ---
    # Least-squares E on the running inlier set via DIRECT SVD of the
    # weighted design matrix (the round-1 normal-equation eigh squared the
    # condition number and could collapse a 90%-inlier consensus in f32).
    # Each round is accepted only if it grows the inlier count — on
    # near-degenerate structure (few planes) an unguarded refit can drift
    # onto a spurious nullspace direction even in f64.
    a = jnp.einsum("ni,nj->nij", x2, x1).reshape(n, 9)
    s_ess = jnp.asarray([1.0, 1.0, 0.0], E_h.dtype)

    def refit_round(carry, _):
        E, inliers, count = carry
        w = inliers.astype(jnp.float32)
        _, _, vt = jnp.linalg.svd(a * w[:, None], full_matrices=True)
        e = vt[-1].reshape(3, 3)
        u_, _, vt2 = jnp.linalg.svd(e)
        E_new = u_ @ (s_ess[:, None] * vt2)
        inl_new = (_sampson_sq(E_new, x1, x2) < thr2) & mask
        cnt_new = jnp.sum(inl_new)
        # Accept on ties too: when every match is already an inlier (loose
        # threshold), the hypothesis can't be beaten on count but the LS
        # refit over all inliers is still far more accurate than any single
        # 8-point solve.  Strictly-worse refits (the near-degenerate
        # collapse case) remain rejected.
        better = cnt_new >= count
        E = jnp.where(better, E_new, E)
        inliers = jnp.where(better, inl_new, inliers)
        count = jnp.maximum(cnt_new, count)
        return (E, inliers, count), None

    (E, inliers, _), _ = jax.lax.scan(
        refit_round, (E_h[best], inl_h[best], scores[best]), None, length=3
    )

    R, t = _recover_pose(E, x1, x2, inliers)
    return TwoViewResult(E=E, R=R, t=t, inliers=inliers, num_inliers=jnp.sum(inliers))


def _recover_pose(E: jax.Array, x1: jax.Array, x2: jax.Array, inliers: jax.Array):
    """Decompose E into the 4 (R, t) candidates and pick the one with the
    most points in front of both cameras (cheirality, SURVEY.md §7.1)."""
    u, _, vt = jnp.linalg.svd(E)
    # Proper rotations: flip the sign of the last row/col if det < 0.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[:, 2]
    Rs = jnp.stack([r1, r1, r2, r2])  # (4, 3, 3)
    ts = jnp.stack([t, -t, t, -t])  # (4, 3)

    pts = triangulate(Rs, ts, x1, x2)  # (4, N, 3)
    z1 = pts[..., 2]
    z2 = jnp.einsum("cij,cnj->cni", Rs, pts)[..., 2] + ts[..., 2][:, None]
    good = (z1 > 0) & (z2 > 0) & inliers[None, :]
    best = jnp.argmax(jnp.sum(good, axis=-1))
    return Rs[best], ts[best]


def triangulate(R: jax.Array, t: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Midpoint triangulation; R (..., 3, 3), t (..., 3), x1/x2 (N, 3)
    normalized homogeneous -> (..., N, 3) points in the camera-1 frame.

    Solves the 2-unknown least-squares depth system
        d1 * x1 - d2 * R^T x2 = -R^T t
    with a closed-form 2x2 normal-equation inverse — no per-point
    decomposition, fully batched, well-conditioned (vs DLT's squared
    condition number in f32)."""
    rx2 = jnp.einsum("...ji,nj->...ni", R, x2)  # R^T x2, (..., N, 3)
    b = -jnp.einsum("...ji,...j->...i", R, t)[..., None, :]  # (..., 1, 3)
    a11 = jnp.sum(x1 * x1, axis=-1)  # (N,)
    a12 = -jnp.sum(x1 * rx2, axis=-1)  # (..., N)
    a22 = jnp.sum(rx2 * rx2, axis=-1)
    b1 = jnp.sum(x1 * b, axis=-1)
    b2 = -jnp.sum(rx2 * b, axis=-1)
    det = a11 * a22 - a12 * a12
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    d1 = (b1 * a22 - b2 * a12) / safe_det
    d2 = (b2 * a11 - b1 * a12) / safe_det
    p1 = d1[..., None] * x1
    p2 = d2[..., None] * rx2 + b
    return 0.5 * (p1 + p2)


@functools.lru_cache(maxsize=8)
def _compiled(config: RansacConfig):
    return jax.jit(
        lambda x1, x2, mask, key: estimate_relative_pose_fn(x1, x2, mask, key, config)
    )


def estimate_relative_pose(
    x1, x2, mask, config: RansacConfig | None = None, key=None
) -> TwoViewResult:
    config = config or RansacConfig()
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    return _compiled(config)(x1, x2, mask, key)
