"""Device mesh + sharded batch front-end (SURVEY.md §2 parallelism table).

The reference is single-threaded CPU; the frames/s axis of the TPU rebuild is
**data parallelism**: shard a batch of frames over the `data` mesh axis with
`shard_map`, run the whole AKAZE front-end per shard, keep results sharded.
Collectives only appear where a global quantity is needed (e.g. a psum'd
keypoint count, or the BA reductions in akaze_tpu.sfm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.pipeline import extract_fn


def make_mesh(num_data: int | None = None, devices=None) -> Mesh:
    """1-D `data` mesh over the available devices (SURVEY.md §2: DP is the
    dominant throughput axis)."""
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices)
    return Mesh(np.asarray(devices[:num_data]), axis_names=("data",))


@functools.lru_cache(maxsize=8)
def _compiled_sharded_extract(mesh: Mesh, config: AkazeConfig):
    sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, out_shardings=sharding)
    def run(imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, sharding)
        return jax.vmap(lambda im: extract_fn(im, config))(imgs)

    return run, sharding


def extract_batch_sharded(imgs, mesh: Mesh, config: AkazeConfig | None = None):
    """Batched extraction with the frame axis sharded over `data`.

    Batch size must be a multiple of the mesh size.  Returns Features with
    (B, K) leaves, left device-sharded for downstream sharded matching.
    """
    config = config or AkazeConfig()
    imgs = jnp.asarray(imgs, jnp.float32)
    assert imgs.ndim == 3
    assert imgs.shape[0] % mesh.devices.size == 0, (
        f"batch {imgs.shape[0]} not divisible by mesh size {mesh.devices.size}"
    )
    run, sharding = _compiled_sharded_extract(mesh, config)
    return run(jax.device_put(imgs, sharding))


def total_valid_keypoints(features) -> jax.Array:
    """Global keypoint count across the sharded batch (a psum-shaped
    collective reduction XLA lowers over ICI)."""
    return jnp.sum(features.keypoints.valid.astype(jnp.int32))
