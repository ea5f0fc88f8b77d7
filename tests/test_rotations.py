"""SO(3) rotvec<->matrix roundtrips, including the theta ~ pi branch where
the skew-part axis vanishes (ADVICE round-1 finding: the naive log collapsed
180-degree rotations toward zero)."""

import numpy as np
import pytest

import jax.numpy as jnp

from akaze_tpu.sfm.rotations import matrix_to_rotvec, rotvec_to_matrix


@pytest.mark.parametrize(
    "theta",
    [0.0, 1e-6, 1e-3, 0.5, 1.5, 3.0, np.pi - 0.02, np.pi - 1e-3, np.pi - 1e-5, np.pi],
)
def test_roundtrip_all_angles(theta):
    rng = np.random.default_rng(int(theta * 1e6) % 2**31)
    for _ in range(5):
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        rv = (ax * theta).astype(np.float32)
        m = rotvec_to_matrix(jnp.asarray(rv))
        back = matrix_to_rotvec(m)
        m2 = np.asarray(rotvec_to_matrix(back))
        # The rotvec itself is sign/2pi-ambiguous at pi; compare matrices.
        assert np.abs(m2 - np.asarray(m)).max() < 3e-5


def test_roundtrip_batched():
    rng = np.random.default_rng(7)
    rv = rng.normal(0, 1.2, (32, 3)).astype(np.float32)
    # log maps into theta in [0, pi]; wrap larger samples onto that branch.
    n = np.linalg.norm(rv, axis=1, keepdims=True)
    rv = np.where(n > np.pi, rv * (1.0 - 2.0 * np.pi / n), rv).astype(np.float32)
    m = rotvec_to_matrix(jnp.asarray(rv))
    back = np.asarray(matrix_to_rotvec(m))
    np.testing.assert_allclose(back, rv, atol=1e-4)


def test_pi_axis_recovered():
    """At exactly pi the returned vector must have magnitude pi (not ~0)."""
    for ax in (np.eye(3).astype(np.float32)):
        m = rotvec_to_matrix(jnp.asarray(ax * np.pi, jnp.float32))
        back = np.asarray(matrix_to_rotvec(m))
        assert abs(np.linalg.norm(back) - np.pi) < 1e-4
        # Axis parallel to the input (sign is a gauge choice at pi).
        c = abs(np.dot(back / np.linalg.norm(back), ax))
        assert c > 0.9999
