"""Brute-force Hamming matcher on packed uint32 descriptors (SURVEY.md §3.4).

TPU-first design: the distance matrix is XOR + `lax.population_count` over
uint32[K, W] blocks — a tiled, fixed-shape all-pairs reduction that XLA lays
out on the VPU; argmin / ratio / mutual filters are fused masked reductions.
Invalid descriptor slots (validity-mask SoA, SURVEY.md §7.1) never match.

Oracle: akaze_tpu.golden.matching (same semantics on dynamic shapes).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp

from akaze_tpu.core.config import MatchConfig

_BIG = jnp.int32(1 << 30)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Matches:
    """Fixed-shape match set: for each query (row of A) the best B index,
    its distance, and whether the match passed all filters."""

    idx_b: jax.Array  # i32 (..., Ka)
    distance: jax.Array  # i32 (..., Ka)
    accepted: jax.Array  # bool (..., Ka)

    def count(self) -> jax.Array:
        return jnp.sum(self.accepted.astype(jnp.int32), axis=-1)


def hamming_distance_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """a: u32 (Ka, W), b: u32 (Kb, W) -> i32 (Ka, Kb)."""
    xor = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(jax.lax.population_count(xor), axis=-1).astype(jnp.int32)


def _match_backend(config: MatchConfig) -> str:
    """Matcher backend: "pallas" = one-pass VMEM-resident reduction kernel
    (kernels/match_pallas, identical outputs, skips the HBM distance-cube
    round trips); "xla" = the dense formulation below.  Source of truth is
    config.backend; AKAZE_MATCH=pallas|xla is a trace-time A/B override."""
    from akaze_tpu.core.config import _env_override

    b = _env_override("AKAZE_MATCH", config.backend, allowed=("pallas", "xla"))
    if b in ("pallas", "xla"):
        return b
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def match_fn(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    config: MatchConfig,
) -> Matches:
    """Traceable matcher core (golden.matching semantics, fixed shapes)."""
    if _match_backend(config) == "pallas":
        from akaze_tpu.kernels.match_pallas import match_reduce

        best, second, nn_b, _, nn_a = match_reduce(
            desc_a, valid_a, desc_b, valid_b,
            interpret=jax.default_backend() != "tpu",
        )
        rows = jnp.arange(desc_a.shape[0])
        ok = valid_a & (best <= config.max_distance)
        ok &= best.astype(jnp.float32) < config.ratio * second.astype(
            jnp.float32
        )
        if config.mutual:
            ok &= nn_a[nn_b] == rows
        return Matches(idx_b=nn_b, distance=best, accepted=ok)

    d = hamming_distance_matrix(desc_a, desc_b)
    d = jnp.where(valid_b[None, :], d, _BIG)
    nn_b = jnp.argmin(d, axis=1)
    rows = jnp.arange(d.shape[0])
    best = d[rows, nn_b]
    d2 = d.at[rows, nn_b].set(_BIG)
    second = jnp.min(d2, axis=1)
    ok = valid_a & (best <= config.max_distance)
    ok &= best.astype(jnp.float32) < config.ratio * second.astype(jnp.float32)
    if config.mutual:
        da = jnp.where(valid_a[:, None], d, _BIG)
        nn_a = jnp.argmin(da, axis=0)
        ok &= nn_a[nn_b] == rows
    return Matches(idx_b=nn_b.astype(jnp.int32), distance=best, accepted=ok)


@functools.lru_cache(maxsize=8)
def _compiled_match(config: MatchConfig):
    return jax.jit(lambda da, va, db, vb: match_fn(da, va, db, vb, config))


def match(desc_a, valid_a, desc_b, valid_b, config: MatchConfig | None = None) -> Matches:
    """Jitted fixed-shape matcher (compile cached per config/shape)."""
    config = config or MatchConfig()
    return _compiled_match(config)(desc_a, valid_a, desc_b, valid_b)


def match_features(feat_a, feat_b, config: MatchConfig | None = None) -> Matches:
    """Convenience wrapper over two `Features` (core.types)."""
    return match(
        feat_a.descriptors, feat_a.keypoints.valid,
        feat_b.descriptors, feat_b.keypoints.valid,
        config,
    )
