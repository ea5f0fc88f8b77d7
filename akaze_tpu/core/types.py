"""Fixed-shape SoA pytree types for the TPU front-end.

The reference returns `Vec<Keypoint>` / `Vec<Descriptor>` (SURVEY.md §2 C2);
dynamic lengths do not exist under `jax.jit`, so the TPU-native containers are
structure-of-arrays with a fixed capacity and a validity mask (SURVEY.md §7.1:
"keypoints are top-K with validity masks, not Vec").  All types are registered
pytrees, so they flow through `jit` / `vmap` / `shard_map` unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Keypoints:
    """Fixed-capacity keypoint set; invalid slots have valid == False.

    Fields mirror the reference `Keypoint` (SURVEY.md §2 C2): (x, y) in
    octave-0 pixel coordinates, det-Hessian `response`, `size` (esigma *
    derivative_factor), `octave`, `class_id` (evolution level index), `angle`.
    Leading dims may include a batch axis.
    """

    x: jax.Array  # f32 (..., K)
    y: jax.Array  # f32 (..., K)
    response: jax.Array  # f32 (..., K)
    size: jax.Array  # f32 (..., K)
    octave: jax.Array  # i32 (..., K)
    class_id: jax.Array  # i32 (..., K)
    angle: jax.Array  # f32 (..., K)
    valid: jax.Array  # bool (..., K)

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def count(self) -> jax.Array:
        """Number of valid keypoints (i32 scalar, or batched)."""
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def to_list(self):
        """Host-side: unpack valid slots into a list of simple records
        (mirrors the reference's Vec<Keypoint> output)."""
        xs = np.asarray(self.x)
        assert xs.ndim == 1, "to_list expects an unbatched Keypoints"
        out = []
        for i in range(self.capacity):
            if bool(np.asarray(self.valid)[i]):
                out.append(
                    dict(
                        x=float(xs[i]),
                        y=float(np.asarray(self.y)[i]),
                        response=float(np.asarray(self.response)[i]),
                        size=float(np.asarray(self.size)[i]),
                        octave=int(np.asarray(self.octave)[i]),
                        class_id=int(np.asarray(self.class_id)[i]),
                        angle=float(np.asarray(self.angle)[i]),
                    )
                )
        return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Features:
    """Keypoints + packed binary descriptors (uint32 words, 486 bits used;
    SURVEY.md §7.1: 'Descriptors packed as uint32[K, 16]')."""

    keypoints: Keypoints
    descriptors: jax.Array  # u32 (..., K, W)

    @property
    def capacity(self) -> int:
        return self.keypoints.capacity


def empty_keypoints(capacity: int, batch: tuple = ()) -> Keypoints:
    shape = (*batch, capacity)
    f32 = jnp.zeros(shape, jnp.float32)
    i32 = jnp.zeros(shape, jnp.int32)
    return Keypoints(
        x=f32, y=f32, response=f32, size=f32,
        octave=i32, class_id=i32, angle=f32,
        valid=jnp.zeros(shape, bool),
    )


def keypoints_to_numpy(kps: Keypoints) -> dict[str, np.ndarray]:
    return {f.name: np.asarray(getattr(kps, f.name)) for f in dataclasses.fields(kps)}
