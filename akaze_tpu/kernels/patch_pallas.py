"""Pipelined per-keypoint patch gather: HBM -> VMEM -> exact (3, PH, PW) crop.

Replaces the XLA `vmap(dynamic_slice)` patch fetch in frontend/describe.py.
That formulation lowers to a SEQUENTIAL while-loop issuing one small DMA per
keypoint (measured ~9-11 GB/s effective on v5e — latency-bound, ~8.9 ms of
the 33.6 ms batch-16 device budget).  Here every keypoint issues tile-aligned
async copies with NSLOT keypoints in flight, so DMA latency overlaps transfer
and the gather runs at memory speed.

Alignment: HBM slice origins must satisfy y % 8 == 0 and x % 128 == 0 (f32
tiles; same constraint as kernels/describe_pallas.py), so the kernel fetches
an aligned (PHA, PWA) superset region and recenters to the requested
(PH, PW) window with dynamic rolls + a static slice.  The output is
bit-identical to the XLA slice path — pure data movement, no arithmetic.

A second win over the XLA path: the gather reads the three level stacks
(Lt, Lx, Ly) directly, so the (F, 3, L, H0, W0) `stacks3` concatenation the
XLA path materializes in HBM (measured ~3 ms/batch16 incl. an XLA bf16
relayout) is never built.

Reference parity note: the reference samples its descriptor pattern straight
from per-level images (SURVEY.md §2 C11); patches exist only as the TPU-side
blocking of those reads, so this kernel has no reference counterpart to cite
beyond the sampling semantics covered in frontend/describe.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_kernel(
    # scalar prefetch (SMEM), all (N,) int32
    frame_ref, lvl_ref, y0a_ref, x0a_ref, dy_ref, dx_ref, valid_ref,
    # tensor inputs: three (F, L, H0P, W0P) f32 stacks in ANY/HBM
    lt_ref, lx_ref, ly_ref,
    # output block (G, 3, PH, PW) f32 VMEM
    out_ref,
    # scratch
    slots,  # (NSLOT, 3, PHA, PWA) f32 VMEM
    sems,   # DMA semaphores (NSLOT, 3)
    *,
    G, NSLOT, PH, PW, PHA, PWA,
):
    pid = pl.program_id(0)
    base = pid * G
    nkp = valid_ref.shape[0]
    chans = (lt_ref, lx_ref, ly_ref)

    def make_dma(slot, k):
        g = jnp.minimum(base + k, nkp - 1)  # clamped lookahead; guarded below
        y0 = pl.multiple_of(y0a_ref[g], 8)
        x0 = pl.multiple_of(x0a_ref[g], 128)
        return [
            pltpu.make_async_copy(
                ch.at[frame_ref[g], lvl_ref[g], pl.ds(y0, PHA), pl.ds(x0, PWA)],
                slots.at[slot, c],
                sems.at[slot, c],
            )
            for c, ch in enumerate(chans)
        ]

    def start(k):
        @pl.when((k < G) & (valid_ref[jnp.minimum(base + k, nkp - 1)] > 0))
        def _():
            for dma in make_dma(jax.lax.rem(k, NSLOT), k):
                dma.start()

    # Warm the pipeline: NSLOT-1 copies in flight before the loop.
    for k in range(NSLOT - 1):
        start(k)

    def body(k, carry):
        start(k + NSLOT - 1)
        slot = jax.lax.rem(k, NSLOT)

        @pl.when(valid_ref[base + k] > 0)
        def _():
            for dma in make_dma(slot, k):
                dma.wait()
            # Recenter: want rows [dy, dy+PH) and lanes [dx, dx+PW) of the
            # aligned fetch.  pltpu.roll(x, s, ax)[i] = x[i - s], so shifting
            # by (dim - d) % dim brings index d to position 0.
            patch = slots[slot]  # (3, PHA, PWA)
            dy = dy_ref[base + k]
            dx = dx_ref[base + k]
            if PHA > PH:
                patch = pltpu.roll(patch, jax.lax.rem(PHA - dy, PHA), 1)
            if PWA > PW:
                patch = pltpu.roll(patch, jax.lax.rem(PWA - dx, PWA), 2)
            # No None/newaxis indexing here: mixing newaxis into the subscript
            # sends jnp down the gather path, which Mosaic can't lower >2D.
            out_ref[pl.ds(k, 1)] = jnp.expand_dims(patch[:, :PH, :PW], 0)

        @pl.when(valid_ref[base + k] == 0)
        def _():
            out_ref[pl.ds(k, 1)] = jnp.zeros((1, 3, PH, PW), jnp.float32)

        return carry

    jax.lax.fori_loop(0, G, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("ph", "pw", "interpret"),
)
def _gather(lt, lx, ly, frame, lvl, y0d, x0d, valid, *, ph, pw, interpret):
    F, L, H0, W0 = lt.shape
    N = frame.shape[0]
    G = 8
    NSLOT = 4
    assert N % G == 0, f"keypoint count {N} must be a multiple of {G}"

    # Pad the stacks to tile-aligned planes so full aligned fetches are legal
    # (identity at VGA: 480 % 8 == 0, 640 % 128 == 0).
    H0P = _round_up(H0, 8)
    W0P = _round_up(W0, 128)
    if (H0P, W0P) != (H0, W0):
        padw = ((0, 0), (0, 0), (0, H0P - H0), (0, W0P - W0))
        lt, lx, ly = (jnp.pad(a, padw) for a in (lt, lx, ly))

    PHA = min(ph + 8, H0P)
    PWA = min(_round_up(pw + 127, 128), W0P)
    # Aligned origins covering the requested window:
    #   y0a = min(floor8(y0d), H0P - PHA)  =>  dy = y0d - y0a in [0, PHA - PH]
    #   x0a = min(floor128(x0d), W0P - PWA) => dx = x0d - x0a in [0, PWA - PW]
    y0a = jnp.minimum((y0d // 8) * 8, H0P - PHA)
    x0a = jnp.minimum((x0d // 128) * 128, W0P - PWA)
    dy = y0d - y0a
    dx = x0d - x0a

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(N // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(
            (G, 3, ph, pw), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 3, PHA, PWA), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOT, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _gather_kernel, G=G, NSLOT=NSLOT, PH=ph, PW=pw, PHA=PHA, PWA=PWA
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 3, ph, pw), jnp.float32),
        interpret=interpret,
    )(
        frame.astype(jnp.int32),
        lvl.astype(jnp.int32),
        y0a.astype(jnp.int32),
        x0a.astype(jnp.int32),
        dy.astype(jnp.int32),
        dx.astype(jnp.int32),
        valid.astype(jnp.int32),
        lt, lx, ly,
    )


def gather_patches(
    stacks: dict,
    frame: jax.Array,
    lvl: jax.Array,
    y0: jax.Array,
    x0: jax.Array,
    valid: jax.Array,
    *,
    ph: int,
    pw: int,
    interpret: bool = False,
) -> jax.Array:
    """Gather per-keypoint patches from the level stacks.

    stacks: dict with "Lt", "Lx", "Ly" of shape (F, L, H0, W0) — or
    (L, F, H0, W0) when stacks["level_major"] is set (the copy-free layout
    the batched TPU builder emits; see frontend/scale_space.stack_levels) —
    or (L, H0, W0) for a single frame.  frame/lvl/y0/x0/valid: (N,) int
    arrays; y0/x0 are the DESIRED (unaligned) patch origins, exactly as
    frontend/describe.py computes them.  Returns (N, 3, ph, pw) f32 with
    out[n, c] == Lt-like[frame[n], lvl[n], y0[n]:y0[n]+ph, x0[n]:x0[n]+pw]
    for valid slots and zeros for invalid ones.
    """
    lt, lx, ly = stacks["Lt"], stacks["Lx"], stacks["Ly"]
    level_major = bool(stacks.get("level_major", False)) and lt.ndim == 4
    if lt.ndim == 3:
        lt, lx, ly = lt[None], lx[None], ly[None]
    if level_major:
        # (L, F, ...): the kernel's leading-two index order is positional,
        # so swapping the index operands reads the level-major layout
        # without any transpose.
        frame, lvl = lvl, frame
    return _gather(
        lt, lx, ly, frame, lvl, y0, x0, valid, ph=ph, pw=pw, interpret=interpret
    )
