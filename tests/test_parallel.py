"""Multi-device tests on the forced 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.scale_space import diffusion_step, fed_cycle
from akaze_tpu.parallel.mesh import extract_batch_sharded, make_mesh, total_valid_keypoints
from akaze_tpu.parallel.spatial import sharded_fed_cycle
from akaze_tpu.utils.synthetic import textured_scene


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_fed_matches_single_device():
    """Halo-exchange stencil == unsharded stencil, bitwise."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    lt = rng.uniform(0, 1, (64, 80)).astype(np.float32)
    g = rng.uniform(0.1, 1, (64, 80)).astype(np.float32)
    taus = (0.25, 0.19, 0.1)
    ref = lt
    for tau in taus:
        ref = np.asarray(diffusion_step(jnp.asarray(ref), jnp.asarray(g), tau))
    out = np.asarray(sharded_fed_cycle(jnp.asarray(lt), jnp.asarray(g), taus, mesh))
    np.testing.assert_allclose(out, ref, atol=1e-6)  # fp fusion-order noise


def test_sharded_batch_extract_matches_single(small_image):
    """DP-sharded batched extraction == single-device batched extraction."""
    from akaze_tpu.frontend.pipeline import extract_batch

    mesh = make_mesh(8)
    cfg = AkazeConfig(max_keypoints=128, per_level_candidates=32)
    imgs = np.stack([textured_scene(*small_image.shape, seed=s) for s in range(8)])
    sharded = extract_batch_sharded(imgs, mesh, cfg)
    single = extract_batch(imgs, cfg)
    assert np.array_equal(
        np.asarray(sharded.keypoints.valid), np.asarray(single.keypoints.valid)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.keypoints.x), np.asarray(single.keypoints.x), atol=1e-5
    )
    assert np.array_equal(
        np.asarray(sharded.descriptors), np.asarray(single.descriptors)
    )
    n = int(total_valid_keypoints(sharded))
    assert n == int(single.keypoints.count().sum())
    assert n > 0
