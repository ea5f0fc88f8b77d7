"""Two-view geometry: on-device RANSAC essential matrix, pose, triangulation.

The reference stops at descriptor matching; `[SPEC]` (SURVEY.md §3.4, §7.2
step 3) extends the rebuild with essential-matrix pose.  TPU-first design
(SURVEY.md §7.3 "On-device RANSAC"): a FIXED number of hypotheses evaluated
as one batched program — sample 8-tuples with `jax.random`, solve all
hypotheses in pure vectorized jnp (det-minor nullspace + Jacobi essential
projection; LAPACK-style custom calls execute per matrix on TPU and
dominated the dispatch), score every hypothesis against every
correspondence with masked Sampson errors, `argmax` inlier count.  No early
exit, no dynamic shapes; invalid match slots simply carry zero weight.
Round-3 rework: 107 -> 30 ms per 8-pair dispatch (key-sweep accuracy
identical to the SVD formulation it replaced).
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


def _det8(m: jax.Array) -> jax.Array:
    """Batched determinant of (..., 8, 8) via Gaussian elimination with
    partial pivoting — pure jnp (no LAPACK custom call: on TPU the batched
    SVD/LU custom calls execute per-matrix and dominated the whole RANSAC
    dispatch; measured 76 of 82 ms/rep round 3)."""
    n = m.shape[-1]
    det = jnp.ones(m.shape[:-2], m.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, m.shape[:-1], len(m.shape) - 2)
    for k in range(n):
        col = jnp.abs(m[..., :, k])
        col = jnp.where(rows >= k, col, -1.0)  # rows above k are settled
        p = jnp.argmax(col, axis=-1)  # (...,) pivot row
        # Swap rows k and p (batched, via selection masks).
        is_k = rows == k
        is_p = rows == p[..., None]
        row_k = jnp.sum(jnp.where(is_k[..., None], m, 0.0), axis=-2)
        row_p = jnp.sum(jnp.where(is_p[..., None], m, 0.0), axis=-2)
        m = jnp.where(is_k[..., None], row_p[..., None, :], m)
        m = jnp.where(is_p[..., None] & jnp.logical_not(is_k[..., None]),
                      row_k[..., None, :], m)
        det = jnp.where(p == k, det, -det)
        pivot = m[..., k, k]
        det = det * pivot
        # Eliminate below the pivot (masked full-matrix rank-1 update).
        safe = jnp.where(pivot == 0, 1.0, pivot)
        f = jnp.where(rows > k, m[..., :, k] / safe[..., None], 0.0)
        m = m - f[..., :, None] * m[..., k : k + 1, :]
    return det


def _nullspace_9(a: jax.Array) -> jax.Array:
    """Right null vector of a batched (..., 8, 9) full-rank system via the
    generalized cross product: x_i = (-1)^i det(a with column i dropped).
    Exact up to f32 elimination error; rank-deficient inputs yield ~0
    vectors (their hypotheses simply score no inliers)."""
    comps = []
    cols = list(range(9))
    for i in range(9):
        idx = jnp.asarray([c for c in cols if c != i])
        comps.append(((-1.0) ** i) * _det8(a[..., :, idx]))
    x = jnp.stack(comps, axis=-1)  # (..., 9)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)


def _enforce_essential(e: jax.Array, sweeps: int = 4) -> jax.Array:
    """Project batched (..., 3, 3) matrices onto the essential manifold
    (singular values -> (1, 1, 0)) with a one-sided Jacobi SVD in pure jnp.

    Scoring with UNenforced nullspace hypotheses measurably degrades the
    recovered pose (key-sweep medians ~2x worse on the calibrated
    benchmark), and the batched (H, 3, 3) SVD custom call costs ~14 ms per
    8-pair dispatch on TPU (custom calls execute per matrix).  One-sided
    Jacobi orthogonalizes columns in a few cyclic sweeps: A G1 G2 ... =
    U diag(s); applying the same rotations to an identity accumulates V.
    The projection is sum of u_i v_i^T over the two largest singular
    values."""
    a = e
    v = jnp.broadcast_to(jnp.eye(3, dtype=e.dtype), e.shape)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            ap = a[..., :, p]
            aq = a[..., :, q]
            app = jnp.sum(ap * ap, axis=-1)
            aqq = jnp.sum(aq * aq, axis=-1)
            apq = jnp.sum(ap * aq, axis=-1)
            tau = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
            # tau == 0 with apq != 0 means app == aqq exactly: sign(0) = 0
            # would skip the rotation and the pair never orthogonalizes —
            # the correct Jacobi angle there is 45 degrees (t = 1).
            t = jnp.where(
                tau == 0,
                1.0,
                jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)),
            )
            t = jnp.where(apq == 0, 0.0, t)
            c = (1.0 / jnp.sqrt(1.0 + t * t))[..., None]
            s = c * t[..., None]
            new_p = c * ap - s * aq
            new_q = s * ap + c * aq
            a = a.at[..., :, p].set(new_p).at[..., :, q].set(new_q)
            vp = v[..., :, p]
            vq = v[..., :, q]
            new_vp = c * vp - s * vq
            new_vq = s * vp + c * vq
            v = v.at[..., :, p].set(new_vp).at[..., :, q].set(new_vq)
    norms = jnp.linalg.norm(a, axis=-2)  # (..., 3) singular values
    # keep[i] = 1 for the two largest singular values (index tie-break).
    n_i = norms[..., :, None]
    n_j = norms[..., None, :]
    i_idx = jax.lax.broadcasted_iota(jnp.int32, norms.shape + (3,), norms.ndim - 1)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, norms.shape + (3,), norms.ndim)
    rank = jnp.sum((n_j > n_i) | ((n_j == n_i) & (j_idx < i_idx)), axis=-1)
    keep = (rank <= 1).astype(e.dtype)  # (..., 3)
    u = a / jnp.maximum(norms[..., None, :], 1e-30)
    return jnp.einsum("...ik,...k,...jk->...ij", u, keep, v)


def _essential_from_8pt(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Batched 8-point solve: x1, x2 (H, 8, 3) -> E (H, 3, 3) with the
    essential constraint enforced.  Pure jnp throughout (det-minor
    nullspace + Jacobi projection): the original batched SVD custom calls
    executed per matrix on TPU and were 76 of the 82 ms RANSAC dispatch."""
    a = jnp.einsum("hni,hnj->hnij", x2, x1).reshape(*x1.shape[:-2], 8, 9)
    e = _nullspace_9(a).reshape(*x1.shape[:-2], 3, 3)
    return _enforce_essential(e)


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
    # (An MSAC objective — truncated residual sum — was tried here round 3
    # and measured WORSE key-sweep scatter on the calibrated benchmark
    # (seed-7 t-dir max 5.1 -> 78 deg): with ~100 noisy matches the tighter
    # residual sum favors small over-fit consensus sets.  Keep counts.)

    # --- guarded iterated refit (LO-RANSAC style) ---
    # Least-squares E on the running inlier set via QR of the weighted
    # design matrix + SVD of its 9x9 R factor — backward-stable like the
    # round-2 direct (N, 9) SVD (R shares A's right singular vectors; no
    # Gram squaring like the rejected round-1 eigh) at a fraction of the
    # custom-call cost.  Each round is accepted only if it grows the inlier
    # count — on near-degenerate structure (few planes) an unguarded refit
    # can drift onto a spurious nullspace direction even in f64.
    a = jnp.einsum("ni,nj->nij", x2, x1).reshape(n, 9)
    s_ess = jnp.asarray([1.0, 1.0, 0.0], E_h.dtype)

    def refit_round(carry, _):
        E, inliers, count = carry
        w = inliers.astype(jnp.float32)
        # Smallest right singular vector of the weighted design matrix via
        # QR -> 9x9 SVD: same backward-stable answer as the direct (N, 9)
        # SVD (R shares A's right singular vectors; no Gram squaring like
        # the rejected round-1 eigh), but the expensive custom call shrinks
        # from an N x 9 SVD to one (N, 9) QR plus a 9x9 SVD.
        r = jnp.linalg.qr(a * w[:, None], mode="r")
        _, _, vt = jnp.linalg.svd(r, full_matrices=True)
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

    # BEAM refit (round 5): refit from the top-M hypotheses, not just the
    # single count-winner.  Committing to one hypothesis was fragile on
    # the plane-structured benchmark: with ~90% inliers a wrong-model
    # hypothesis occasionally tops the raw count (a wrong E can fit a
    # plane-dominated subset), and the guarded refit then polishes the
    # wrong basin — measured 1-2 of 12 (scene-seed, ransac-seed) combos
    # landing at rot 5-8 deg / t-dir 50-83 deg while other seeds measured
    # 0.1-1 deg on the same matches; in the worst case ALL top-8 raw-count
    # hypotheses sat in the same wrong basin, so the beam must reach past
    # them (M=16 still left one catastrophic combo; the default M=32
    # clears all 24 — core/config.py refit_beam).  Each beam entry costs
    # one (N, 9) QR + tiny SVDs per refit round.
    M = min(config.refit_beam, config.num_iterations)
    _, top = jax.lax.top_k(scores, M)

    def refit_beam(E0, inl0, cnt0):
        (E, inliers, cnt), _ = jax.lax.scan(
            refit_round, (E0, inl0, cnt0), None, length=3
        )
        return E, inliers, cnt

    E_b, inl_b, cnt_b = jax.vmap(refit_beam)(
        E_h[top], inl_h[top], scores[top]
    )
    # Select among the refit basins by CHEIRALITY-VALID inlier count, not
    # raw Sampson count: on plane-structured scenes a spurious E can keep
    # ~85% of the true model's Sampson inliers (measured: a 96-inlier
    # wrong basin vs the 116-inlier true one, rot error 7 deg / t-dir 70),
    # but its decomposition triangulates a large fraction of those
    # "inliers" BEHIND a camera — the physically-realizable count
    # separates the basins decisively.
    R_b, t_b, ch_b = jax.vmap(
        lambda e, inl: _recover_pose(e, x1, x2, inl)
    )(E_b, inl_b)
    best = jnp.argmax(ch_b)
    E = E_b[best]
    inliers = inl_b[best]
    R = R_b[best]
    t = t_b[best]
    return TwoViewResult(E=E, R=R, t=t, inliers=inliers, num_inliers=jnp.sum(inliers))


def _recover_pose(E: jax.Array, x1: jax.Array, x2: jax.Array, inliers: jax.Array):
    """Decompose E into the 4 (R, t) candidates and pick the one with the
    most points in front of both cameras (cheirality, SURVEY.md §7.1).
    Returns (R, t, cheirality_count) — the count doubles as a model-quality
    score for the beam selection in _estimate_relative_pose_f32."""
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
    counts = jnp.sum(good, axis=-1)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best]


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
