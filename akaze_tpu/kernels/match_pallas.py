"""One-pass Pallas Hamming matcher: XOR+popcount, best/second/argmin and
column minima without materializing the distance matrix in HBM.

The XLA formulation in matching/hamming.py builds the (Ka, Kb) i32 distance
cube and re-reads it for argmin, the second-best masked min, and the mutual
axis-0 argmin — several full HBM round trips over ~4 MB per frame pair
(measured ~1.2 ms of the 23 ms batch-16 headline budget for 15 pairs).
Descriptors themselves are tiny (u32[1024, 16] = 64 KB/side), so this kernel
keeps them in VMEM, computes each (RB, Kb) distance block once, and reduces
it in place to per-row best/second/nearest plus per-column running minima.
Only O(Ka + Kb) vectors ever leave the kernel.

Semantics match matching/hamming.py.match_fn (and the golden oracle,
golden/matching.py) exactly, including argmin tie-breaks (lowest index wins):
row blocks are processed in increasing row order and column minima update on
strict improvement only.

Reference parity note: the reference's matcher is a brute-force Hamming
nearest-neighbor over 61-byte descriptors (SURVEY.md §3.4); this kernel is
the TPU-native realization of that same contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 30  # plain int: jnp constants would be captured consts in the kernel


def _match_kernel(
    a_ref,  # u32 (RB, W) VMEM — row block of A descriptors
    va_ref,  # i32 (1, RB) VMEM — A validity for this block
    b_ref,  # u32 (Kb, W) VMEM — all B descriptors
    vb_ref,  # i32 (1, Kb) VMEM — B validity
    best_ref,  # i32 (1, RB) out
    second_ref,  # i32 (1, RB) out
    nn_ref,  # i32 (1, RB) out
    colmin_ref,  # i32 (1, Kb) out — accumulated across row blocks
    colarg_ref,  # i32 (1, Kb) out — accumulated across row blocks
    *,
    RB: int,
    Kb: int,
    W: int,
):
    pid = pl.program_id(0)

    d = jnp.zeros((RB, Kb), jnp.int32)
    for w in range(W):  # static unroll: W=16 u32 words (486/512 bits)
        xor = a_ref[:, w][:, None] ^ b_ref[:, w][None, :]
        d = d + jax.lax.population_count(xor).astype(jnp.int32)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (RB, Kb), 1)

    # Row reductions over B-validity-masked distances.
    db = jnp.where(vb_ref[0, :][None, :] > 0, d, _BIG)
    best = jnp.min(db, axis=1)
    nn = jnp.min(
        jnp.where(db == best[:, None], col_iota, jnp.int32(Kb)), axis=1
    )
    second = jnp.min(jnp.where(col_iota == nn[:, None], _BIG, db), axis=1)
    best_ref[0, :] = best
    second_ref[0, :] = second
    nn_ref[0, :] = nn

    # Column minima over A-validity-masked distances (for the mutual check).
    da = jnp.where(va_ref[0, :][:, None] > 0, d, _BIG)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (RB, Kb), 0)
    cmin = jnp.min(da, axis=0)
    carg = (
        jnp.min(
            jnp.where(da == cmin[None, :], row_iota, jnp.int32(RB)), axis=0
        )
        + pid * RB
    )

    @pl.when(pid == 0)
    def _():
        colmin_ref[0, :] = cmin
        colarg_ref[0, :] = carg

    @pl.when(pid > 0)
    def _():
        cur = colmin_ref[0, :]
        upd = cmin < cur  # strict: earlier row blocks win ties
        colmin_ref[0, :] = jnp.where(upd, cmin, cur)
        colarg_ref[0, :] = jnp.where(upd, carg, colarg_ref[0, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_reduce(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    interpret: bool = False,
):
    """Per-row (best, second, nn) and per-column (colmin, colarg) Hamming
    reductions for one descriptor pair.  Returns i32 vectors
    (best[Ka], second[Ka], nn[Ka], colmin[Kb], colarg[Kb])."""
    Ka, W = desc_a.shape
    Kb = desc_b.shape[0]
    RB = min(256, Ka)
    assert Ka % RB == 0, (Ka, RB)
    grid = (Ka // RB,)

    kernel = functools.partial(_match_kernel, RB=RB, Kb=Kb, W=W)
    best, second, nn, colmin, colarg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, W), lambda i: (i, 0)),
            pl.BlockSpec((1, RB), lambda i: (0, i)),
            pl.BlockSpec((Kb, W), lambda i: (0, 0)),
            pl.BlockSpec((1, Kb), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, RB), lambda i: (0, i)),
            pl.BlockSpec((1, RB), lambda i: (0, i)),
            pl.BlockSpec((1, RB), lambda i: (0, i)),
            pl.BlockSpec((1, Kb), lambda i: (0, 0)),
            pl.BlockSpec((1, Kb), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Ka), jnp.int32),
            jax.ShapeDtypeStruct((1, Ka), jnp.int32),
            jax.ShapeDtypeStruct((1, Ka), jnp.int32),
            jax.ShapeDtypeStruct((1, Kb), jnp.int32),
            jax.ShapeDtypeStruct((1, Kb), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        desc_a,
        valid_a.astype(jnp.int32)[None, :],
        desc_b,
        valid_b.astype(jnp.int32)[None, :],
    )
    return best[0], second[0], nn[0], colmin[0], colarg[0]
