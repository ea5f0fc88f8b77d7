"""Bundle adjustment: Levenberg-Marquardt with Schur complement, sharded.

No reference counterpart (SURVEY.md §1: the reference stops at feature
extraction); this implements the [SPEC] SfM layer (SURVEY.md §7.2 step 6,
BASELINE.md config 5) TPU-first:

  * Fixed-shape problem: poses (K, 6) [rotvec | trans], points (P, 3), and a
    dense (P, Q) observation table (each point seen by <= Q cameras, invalid
    slots zero-weighted) — no sparse indices, no ragged structures.
  * Per-observation 2x9 Jacobians via vmapped jacfwd; camera blocks reduce
    with segment_sum, the point blocks stay dense (P, 3, 3).
  * Schur complement onto the pose system: S = U' - sum_p Y_p W_p^T built
    with einsum + one segment-sum over (cam_i, cam_j) block ids; solved
    dense (6K x 6K) up to K = 64 and by block-Jacobi-preconditioned CG
    past that (round 3 — the dense LU custom call and the old 2-D
    scatter-add were the K/P scaling walls).  The heavy lifting is the
    per-point work, which is what shards.
  * Distributed BA (SURVEY.md §5 long-context row): shard POINTS over the
    `data` mesh axis with shard_map; each shard computes partial (S, rhs)
    and `jax.lax.psum` reduces them over ICI — the Schur-complement
    reduction IS the collective.  The solve is replicated; point updates
    stay shard-local.
  * LM loop is branchless: fixed iteration count, accept/reject with
    jnp.where, damping doubles/shrinks accordingly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import SfmConfig
from akaze_tpu.sfm.rotations import rotvec_to_matrix


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BAProblem:
    """Fixed-shape BA state + observations.

    poses: (K, 6) camera-from-world [rotvec, translation]
    points: (P, 3) world points
    obs_cam: (P, Q) i32 camera index per observation slot
    obs_uv: (P, Q, 2) f32 normalized image coords
    obs_valid: (P, Q) bool
    fixed: (K,) bool — gauge-fixed poses (updates forced to zero)
    """

    poses: jax.Array
    points: jax.Array
    obs_cam: jax.Array
    obs_uv: jax.Array
    obs_valid: jax.Array
    fixed: jax.Array


def _residual_one(pose6: jax.Array, point3: jax.Array, uv: jax.Array) -> jax.Array:
    """Reprojection residual (2,) for one observation, normalized coords."""
    r = rotvec_to_matrix(pose6[:3])
    xc = r @ point3 + pose6[3:]
    z = jnp.where(jnp.abs(xc[2]) < 1e-9, 1e-9, xc[2])
    return jnp.stack([xc[0] / z - uv[0], xc[1] / z - uv[1]])


def _robust_weight(r: jax.Array, delta: float) -> jax.Array:
    """Huber IRLS weight per observation: min(1, delta/|r|)."""
    norm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    return jnp.minimum(1.0, delta / norm)


def _linearize(problem: BAProblem, delta: float):
    """Per-observation residuals and Jacobians (sqrt-Huber weighted).

    Returns r (P,Q,2), jc (P,Q,2,6), jp (P,Q,2,3)."""

    def f(pose6, point3, uv):
        return _residual_one(pose6, point3, uv)

    jac = jax.jacfwd(lambda pose6, point3, uv: f(pose6, point3, uv), argnums=(0, 1))
    poses_o = problem.poses[problem.obs_cam]  # (P, Q, 6)
    pts_o = jnp.broadcast_to(
        problem.points[:, None, :], (*problem.obs_cam.shape, 3)
    )
    fv = jax.vmap(jax.vmap(f))
    jv = jax.vmap(jax.vmap(jac))
    r = fv(poses_o, pts_o, problem.obs_uv)  # (P, Q, 2)
    jc, jp = jv(poses_o, pts_o, problem.obs_uv)  # (P,Q,2,6), (P,Q,2,3)
    w = _robust_weight(r, delta) * problem.obs_valid  # (P, Q)
    sw = jnp.sqrt(w)[..., None]
    return r * sw, jc * sw[..., None], jp * sw[..., None]


def _cost(problem: BAProblem, delta: float) -> jax.Array:
    """Total Huber cost over valid observations."""
    poses_o = problem.poses[problem.obs_cam]
    pts_o = jnp.broadcast_to(problem.points[:, None, :], (*problem.obs_cam.shape, 3))
    r = jax.vmap(jax.vmap(_residual_one))(poses_o, pts_o, problem.obs_uv)
    n2 = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(n2 + 1e-12)
    huber = jnp.where(n <= delta, 0.5 * n2, delta * (n - 0.5 * delta))
    return jnp.sum(huber * problem.obs_valid)


def _schur_system(problem: BAProblem, lam: jax.Array, config: SfmConfig, axis_name=None):
    """Build the reduced pose system (S, rhs) + point-side factors.

    With axis_name, partial sums reduce via psum over that mesh axis
    (points sharded; poses replicated)."""
    K = problem.poses.shape[0]
    P, Q = problem.obs_cam.shape
    r, jc, jp = _linearize(problem, config.huber_delta)

    flat_cam = problem.obs_cam.reshape(-1)
    # Camera blocks.
    jct_jc = jnp.einsum("pqri,pqrj->pqij", jc, jc).reshape(-1, 6, 6)
    u = jax.ops.segment_sum(jct_jc, flat_cam, num_segments=K)  # (K,6,6)
    g_c = jax.ops.segment_sum(
        jnp.einsum("pqri,pqr->pqi", jc, r).reshape(-1, 6), flat_cam, num_segments=K
    )  # (K,6)
    # Point blocks.
    v = jnp.einsum("pqri,pqrj->pij", jp, jp)  # (P,3,3)
    g_p = jnp.einsum("pqri,pqr->pi", jp, r)  # (P,3)
    w_blk = jnp.einsum("pqri,pqrj->pqij", jc, jp)  # (P,Q,6,3)

    # Marquardt damping on the point blocks, then invert.
    v_d = v + lam * jnp.eye(3) * jnp.maximum(
        jnp.diagonal(v, axis1=-2, axis2=-1).mean(-1)[:, None, None], 1e-8
    )
    vinv = jnp.linalg.inv(v_d + 1e-9 * jnp.eye(3))  # (P,3,3)
    y = jnp.einsum("pqij,pjk->pqik", w_blk, vinv)  # (P,Q,6,3)

    # Schur cross terms reduced into the dense pose system via ONE
    # segment-sum over flattened (cam_i, cam_j) block ids (round 3: the
    # previous 2-D scatter-add materialized a (P*Q^2, 6, 6) index update
    # that fell off a cliff past a few thousand points).
    contrib = jnp.einsum("paik,pbjk->pabij", y, w_blk)  # (P,Q,Q,6,6)
    c1 = jnp.broadcast_to(problem.obs_cam[:, :, None], (P, Q, Q)).reshape(-1)
    c2 = jnp.broadcast_to(problem.obs_cam[:, None, :], (P, Q, Q)).reshape(-1)
    s = -jax.ops.segment_sum(
        contrib.reshape(-1, 6, 6), c1 * K + c2, num_segments=K * K
    ).reshape(K, K, 6, 6)
    s = s.at[jnp.arange(K), jnp.arange(K)].add(u)

    y_gp = jnp.einsum("pqik,pk->pqi", y, g_p).reshape(-1, 6)
    rhs = -(g_c - jax.ops.segment_sum(y_gp, flat_cam, num_segments=K))  # (K,6)

    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        rhs = jax.lax.psum(rhs, axis_name)
        u_diag = jax.lax.psum(u, axis_name)
    else:
        u_diag = u

    # Marquardt damping + gauge fixing on the pose system.
    damp = lam * jnp.maximum(
        jnp.diagonal(u_diag, axis1=-2, axis2=-1).mean(-1), 1e-8
    )
    s = s.at[jnp.arange(K), jnp.arange(K)].add(
        damp[:, None, None] * jnp.eye(6) + 1e-9 * jnp.eye(6)
    )
    fixed = problem.fixed
    mask_k = jnp.logical_not(fixed).astype(s.dtype)
    s = s * mask_k[:, None, None, None] * mask_k[None, :, None, None]
    s = s.at[jnp.arange(K), jnp.arange(K)].add(
        fixed.astype(s.dtype)[:, None, None] * jnp.eye(6)
    )
    rhs = rhs * mask_k[:, None]
    return s, rhs, vinv, w_blk, g_p


def _solve_pose_system(s, rhs, iters: int = 120):
    """Block-Jacobi-preconditioned conjugate gradients on the reduced pose
    system (round-3 verdict item 5: the dense 6Kx6K jnp.linalg.solve is a
    serial LU custom call — fine at K <= 64, a wall past it; CG runs as
    (K, K, 6, 6) x (K, 6) einsum matvecs on the MXU).  S is symmetric
    positive definite by construction (damped Schur complement of an SPD
    system with identity rows on gauge-fixed poses)."""
    K = rhs.shape[0]
    minv = jnp.linalg.inv(
        s[jnp.arange(K), jnp.arange(K)] + 1e-12 * jnp.eye(6)
    )  # (K,6,6) block-Jacobi preconditioner

    def matvec(x):
        return jnp.einsum("kmij,mj->ki", s, x)

    def precond(x):
        return jnp.einsum("kij,kj->ki", minv, x)

    x = jnp.zeros_like(rhs)
    r = rhs  # b - A @ 0
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(state, _):
        x, r, p, rz = state
        ap = matvec(p)
        denom = jnp.sum(p * ap)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(denom == 0, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        beta = jnp.where(rz == 0, 0.0, beta)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


def _apply_update(problem: BAProblem, s, rhs, vinv, w_blk, g_p):
    """Solve the reduced system and back-substitute point updates."""
    K = problem.poses.shape[0]
    if K <= 64:
        s_mat = s.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        dc = jnp.linalg.solve(s_mat, rhs.reshape(-1)).reshape(K, 6)
    else:
        dc = _solve_pose_system(s, rhs)
    dc_o = dc[problem.obs_cam]  # (P,Q,6)
    wt_dc = jnp.einsum("pqij,pqi->pj", w_blk, dc_o)  # (P,3)
    dp = -jnp.einsum("pij,pj->pi", vinv, g_p + wt_dc)
    return BAProblem(
        poses=problem.poses + dc,
        points=problem.points + dp,
        obs_cam=problem.obs_cam,
        obs_uv=problem.obs_uv,
        obs_valid=problem.obs_valid,
        fixed=problem.fixed,
    )


def _lm_loop(problem: BAProblem, config: SfmConfig, axis_name=None) -> BAProblem:
    lam0 = jnp.float32(config.lm_lambda_init)
    cost0 = _cost(problem, config.huber_delta)
    if axis_name is not None:
        cost0 = jax.lax.psum(cost0, axis_name)

    def body(state, _):
        problem, lam, cost = state
        s, rhs, vinv, w_blk, g_p = _schur_system(problem, lam, config, axis_name)
        cand = _apply_update(problem, s, rhs, vinv, w_blk, g_p)
        new_cost = _cost(cand, config.huber_delta)
        if axis_name is not None:
            new_cost = jax.lax.psum(new_cost, axis_name)
        accept = new_cost < cost
        problem = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, problem
        )
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(
            jnp.where(accept, lam / 3.0, lam * 3.0), 1e-9, config.lm_lambda_max
        )
        return (problem, lam, cost), cost

    (problem, _, _), _ = jax.lax.scan(
        body, (problem, lam0, cost0), None, length=config.ba_iterations
    )
    return problem


@functools.partial(jax.jit, static_argnames=("config",))
def bundle_adjust(problem: BAProblem, config: SfmConfig) -> BAProblem:
    """Single-device LM bundle adjustment (fixed iteration count).

    f32 matmul precision: like geometry/twoview.py, the TPU default runs
    matmuls (incl. the CG/Schur products and autodiff transposes) in
    bf16, which is enough to diverge the 200 kf loop bench (measured ATE
    3.75 on TPU vs 0.03 on CPU with identical inputs — round 5); the
    geometry stages are tiny next to the front-end."""
    with jax.default_matmul_precision("float32"):
        return _lm_loop(problem, config)


def bundle_adjust_sharded(problem: BAProblem, config: SfmConfig, mesh) -> BAProblem:
    """Distributed BA: points + observations sharded over mesh axis 'data';
    poses replicated; Schur reduction via psum (SURVEY.md §5)."""
    from jax.sharding import PartitionSpec as P

    pspec = P("data")
    rep = P()
    in_specs = BAProblem(
        poses=rep, points=pspec, obs_cam=pspec, obs_uv=pspec,
        obs_valid=pspec, fixed=rep,
    )
    out_specs = in_specs

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False,
    )
    def run(problem):
        # f32 matmul precision: see bundle_adjust.
        with jax.default_matmul_precision("float32"):
            return _lm_loop(problem, config, axis_name="data")

    return jax.jit(run)(problem)


def reprojection_rmse(problem: BAProblem) -> jax.Array:
    """Unweighted RMS reprojection error over valid observations."""
    poses_o = problem.poses[problem.obs_cam]
    pts_o = jnp.broadcast_to(problem.points[:, None, :], (*problem.obs_cam.shape, 3))
    r = jax.vmap(jax.vmap(_residual_one))(poses_o, pts_o, problem.obs_uv)
    n2 = jnp.sum(r * r, axis=-1) * problem.obs_valid
    denom = jnp.maximum(jnp.sum(problem.obs_valid), 1)
    return jnp.sqrt(jnp.sum(n2) / denom)
