"""Pose-graph optimization: Gauss-Newton over SE(3) relative-pose residuals.

[SPEC] layer with no reference counterpart (SURVEY.md §7.2 step 6 /
BASELINE.md config 5).  Fixed-shape: up to E edges with a validity mask;
the full 6K-parameter normal system is dense (K <= 64 keyframes), built by
autodiff (jacfwd over the stacked residual) and solved with damping —
small, replicated, branchless.

Convention: poses are camera-from-world [rotvec | trans] (matching
sfm.ba); edge (i, j) measures T_ij = T_i @ T_j^{-1} (cam_i-from-cam_j).
Residual = log(T_meas^{-1} T_i T_j^{-1}) as a 6-vector.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from akaze_tpu.sfm.rotations import matrix_to_rotvec, rotvec_to_matrix


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseGraph:
    """poses (K, 6); edges i/j (E,) i32; rel (E, 6) measured cam_i-from-cam_j
    [rotvec | trans]; valid (E,) bool; fixed (K,) bool; weight (E,) f32
    information weights (1/sigma per edge; None = unweighted).

    Weights exist because odometry and closure edges have very different
    information content (round 5): odometry edges carry the BA-polished
    local relative poses (per-edge error ~1e-4), while monocular closure
    edges carry two-view measurement noise (~2e-3 rad, BASELINE.md
    two-view accuracy).  Unweighted PGO trusted both equally, so on a
    low-drift trajectory the closures' own noise INCREASED ATE 3x; with
    information weights the optimum moves only as far as the accumulated
    odometry error actually warrants."""

    poses: jax.Array
    edge_i: jax.Array
    edge_j: jax.Array
    rel: jax.Array
    valid: jax.Array
    fixed: jax.Array
    weight: jax.Array | None = None


def compose(pose_a: jax.Array, pose_b: jax.Array) -> jax.Array:
    """T_a @ T_b for [rotvec|trans] poses (broadcasting on leading dims)."""
    ra = rotvec_to_matrix(pose_a[..., :3])
    rb = rotvec_to_matrix(pose_b[..., :3])
    r = ra @ rb
    t = jnp.einsum("...ij,...j->...i", ra, pose_b[..., 3:]) + pose_a[..., 3:]
    return jnp.concatenate([matrix_to_rotvec(r), t], axis=-1)


def invert(pose: jax.Array) -> jax.Array:
    r = rotvec_to_matrix(pose[..., :3])
    t = -jnp.einsum("...ji,...j->...i", r, pose[..., 3:])
    return jnp.concatenate([-pose[..., :3], t], axis=-1)


def relative(pose_i: jax.Array, pose_j: jax.Array) -> jax.Array:
    """cam_i-from-cam_j: T_i @ T_j^{-1}."""
    return compose(pose_i, invert(pose_j))


def _residuals(poses: jax.Array, graph: PoseGraph) -> jax.Array:
    """(E, 6) log-residuals, zeroed on invalid edges, information-scaled."""
    rel_est = relative(poses[graph.edge_i], poses[graph.edge_j])
    err = compose(invert(graph.rel), rel_est)  # identity when consistent
    err = err * graph.valid[:, None]
    if graph.weight is not None:
        err = err * graph.weight[:, None]
    return err


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(
    graph: PoseGraph, iterations: int = 10, damping: float = 1e-6
) -> PoseGraph:
    """Damped Gauss-Newton; fixed poses pinned via parameter masking."""
    K = graph.poses.shape[0]
    free = jnp.logical_not(graph.fixed)[:, None].astype(graph.poses.dtype)

    def step(poses, _):
        def flat_res(p_flat):
            return _residuals(p_flat.reshape(K, 6), graph).reshape(-1)

        p0 = poses.reshape(-1)
        r = flat_res(p0)
        jmat = jax.jacfwd(flat_res)(p0)  # (6E, 6K)
        mask = jnp.broadcast_to(free, (K, 6)).reshape(-1)
        jmat = jmat * mask[None, :]
        h = jmat.T @ jmat + damping * jnp.eye(6 * K)
        h = h + jnp.diag(jnp.logical_not(mask.astype(bool)).astype(h.dtype))
        g = jmat.T @ r
        delta = -jnp.linalg.solve(h, g) * mask
        return (p0 + delta).reshape(K, 6), jnp.sum(r * r)

    # f32 matmul precision: the jacfwd products and the dense solve must
    # not run at the TPU's bf16 default (same rule as geometry/twoview.py
    # and sfm/ba.py; measured class of failure in BASELINE.md round 5).
    with jax.default_matmul_precision("float32"):
        poses, costs = jax.lax.scan(
            step, graph.poses, None, length=iterations
        )
    return PoseGraph(
        poses=poses, edge_i=graph.edge_i, edge_j=graph.edge_j,
        rel=graph.rel, valid=graph.valid, fixed=graph.fixed,
        weight=graph.weight,
    )
