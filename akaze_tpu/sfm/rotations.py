"""SO(3) utilities: Rodrigues rotation vectors <-> matrices, all jittable.

Axis-angle (rotvec) is the BA state parametrization: minimal (3 dof), no
normalization constraints, smooth near identity — standard for LM solvers.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotvec_to_matrix(r: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) rotation vector -> (..., 3, 3) matrix (Rodrigues).

    Taylor-safe near theta = 0 (the BA increments live there)."""
    theta2 = jnp.sum(r * r, axis=-1, keepdims=True)[..., None]  # (..., 1, 1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    zeros = jnp.zeros_like(r[..., 0])
    k = jnp.stack(
        [
            jnp.stack([zeros, -r[..., 2], r[..., 1]], axis=-1),
            jnp.stack([r[..., 2], zeros, -r[..., 0]], axis=-1),
            jnp.stack([-r[..., 1], r[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), k.shape)
    # K^2 = r r^T - |r|^2 I, computed ELEMENTWISE (outer product via
    # broadcasting): the earlier `k @ k` was a real MXU matmul, which on
    # TPU runs at the bf16 default wherever the caller forgot a precision
    # context — ~3e-3 relative error in every rotation matrix built
    # outside one (round 5: this inflated the 200 kf TPU ATE through
    # camera_centers and friends).  The identity form is exact f32
    # everywhere and cheaper than a matmul.
    rrT = r[..., :, None] * r[..., None, :]
    k2 = rrT - theta2 * eye
    return eye + a * k + b * k2


def matrix_to_rotvec(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Stable over the full range [0, pi] — including theta ~ pi, where the
    skew-part axis vanishes and the axis is recovered from the symmetric
    part (M + I)/2 ~ axis axis^T instead — and, critically for the
    pose-graph solver, which differentiates through log at near-identity
    residuals, has finite autodiff derivatives at theta = 0 (atan2-based
    angle, no arccos)."""
    trace = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    axis_raw = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )  # = 2 sin(theta) * axis
    s2 = jnp.sum(axis_raw * axis_raw, axis=-1, keepdims=True)
    sin_t = 0.5 * jnp.sqrt(s2 + 1e-24)
    theta = jnp.arctan2(sin_t, cos_t[..., None])
    small = sin_t < 1e-4
    safe_sin = jnp.where(small, 1.0, sin_t)
    factor = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * safe_sin))
    generic = axis_raw * factor

    # theta ~ pi: axis_raw -> 0 and the generic path collapses toward zero.
    # There M = 2 axis axis^T - I, so (M + M^T + 2I)/4 = axis axis^T up to
    # O((pi-theta)^2) — symmetrizing first cancels the O(pi-theta) skew term.
    # Take the largest-diagonal column, normalize, and sign-align with
    # axis_raw for continuity just below pi (at exactly pi the sign is a
    # gauge choice).
    b = 0.25 * (m + jnp.swapaxes(m, -1, -2)) + 0.5 * jnp.eye(3, dtype=m.dtype)
    diag = jnp.stack([b[..., 0, 0], b[..., 1, 1], b[..., 2, 2]], axis=-1)
    pick = (jnp.argmax(diag, axis=-1)[..., None] == jnp.arange(3)).astype(m.dtype)
    col = jnp.einsum("...ij,...j->...i", b, pick)
    axis_pi = col / jnp.sqrt(
        jnp.maximum(jnp.sum(col * col, axis=-1, keepdims=True), 1e-24)
    )
    flip = jnp.where(
        jnp.sum(axis_pi * axis_raw, axis=-1, keepdims=True) < 0.0, -1.0, 1.0
    )
    # Window where the generic path's axis error (f32 matrix noise / sin)
    # exceeds the symmetric extraction's O((pi-theta)^2) error.
    near_pi = (cos_t[..., None] < 0.0) & (sin_t < 5e-3)
    return jnp.where(near_pi, axis_pi * flip * theta, generic)


def rotate(r: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply rotvec r (..., 3) to points x (..., 3)."""
    return jnp.einsum("...ij,...j->...i", rotvec_to_matrix(r), x)
