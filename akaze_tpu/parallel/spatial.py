"""Spatial (intra-image) sharding: FED diffusion with halo exchange.

SURVEY.md §2 parallelism table, TP row: when a single frame must go wide,
shard its ROWS across the mesh and run the nonlinear-diffusion stencil with
1-pixel halo exchange between neighboring shards via `jax.lax.ppermute`
(XLA lowers to ICI neighbor sends).  The stencil itself is unchanged — the
halos make each shard's edge behave exactly like the unsharded border.

This path exists for very large frames (the default throughput axis is
batch/data parallelism, parallel/mesh.py); it is also the template the
multi-chip dry run exercises.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from akaze_tpu.frontend.scale_space import diffusion_step


def _exchange_halos(x: jax.Array, axis_name: str) -> tuple[jax.Array, jax.Array]:
    """Return (top_halo, bottom_halo) rows for this shard's block.

    top_halo is the last row of the previous shard (or this shard's own
    first row at the global top edge — replicate border, SURVEY.md §2 C5);
    bottom_halo symmetric.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    # Send my last row down (perm i -> i+1), my first row up (i -> i-1).
    from_above = jax.lax.ppermute(
        x[-1:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_below = jax.lax.ppermute(
        x[:1], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    top = jnp.where(idx == 0, x[:1], from_above)
    bottom = jnp.where(idx == n - 1, x[-1:], from_below)
    return top, bottom


def _sharded_fed_cycle(lt: jax.Array, g: jax.Array, taus, axis_name: str) -> jax.Array:
    """All tau sweeps of one level on a row shard, halos exchanged per step."""

    def one_step(lt, tau):
        top_l, bot_l = _exchange_halos(lt, axis_name)
        top_g, bot_g = _exchange_halos(g, axis_name)
        lt_ext = jnp.concatenate([top_l, lt, bot_l], axis=0)
        g_ext = jnp.concatenate([top_g, g, bot_g], axis=0)
        # diffusion_step edge-pads; rows 1..-1 of its output see the true
        # neighbors, exactly matching the unsharded stencil.
        out = diffusion_step(lt_ext, g_ext, tau)
        return out[1:-1], None

    if len(taus) == 0:
        return lt
    lt, _ = jax.lax.scan(
        lambda c, t: one_step(c, t), lt, jnp.asarray(taus, jnp.float32)
    )
    return lt


@functools.lru_cache(maxsize=8)
def _compiled_sharded_fed(mesh, taus: tuple, axis: str):
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def run(lt, g):
        return _sharded_fed_cycle(lt, g, taus, axis)

    return jax.jit(run)


def sharded_fed_cycle(lt, g, taus, mesh, axis: str = "data"):
    """Run one level's FED tau sweeps with image rows sharded over `axis`.

    lt, g: (H, W) with H divisible by the mesh axis size."""
    assert lt.shape[0] % mesh.shape[axis] == 0, (
        f"rows {lt.shape[0]} not divisible by mesh axis {mesh.shape[axis]}"
    )
    return _compiled_sharded_fed(mesh, tuple(taus), axis)(lt, g)
