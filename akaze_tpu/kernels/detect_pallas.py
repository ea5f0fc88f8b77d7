"""Fused Pallas detect-score kernel: one pass over the Ldet stack.

The XLA candidate pass materializes the 8-neighbor max (8 shifted compares
over the full (L, H0, W0) stack) and then the masked score — several full
HBM round trips.  This kernel reads each level once in VMEM and emits the
final score map (threshold + strict 3x3 max + static interior bounds) that
feeds `approx_max_k` directly.

Grid: one program per (frame, level); per-level interior bounds arrive via
scalar prefetch.  Semantics identical to frontend/detect.find_candidates'
score construction (same -3e38 sentinel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # python float: jnp constants cannot be captured by kernels


def _score_kernel(border_ref, hs_ref, ws_ref, ldet_ref, score_ref, *, threshold, L):
    lvl = jax.lax.rem(pl.program_id(0), L)
    x = ldet_ref[0]  # (H0, W0)
    h0, w0 = x.shape
    # 8-neighbor max; pad values never win inside the interior mask.
    xp = jnp.concatenate([x[:1], x, x[-1:]], axis=0)
    xp = jnp.concatenate([xp[:, :1], xp, xp[:, -1:]], axis=1)
    nmax = None
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            s = xp[dy : dy + h0, dx : dx + w0]
            nmax = s if nmax is None else jnp.maximum(nmax, s)
    b = border_ref[lvl]
    hl = hs_ref[lvl]
    wl = ws_ref[lvl]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h0, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, w0), 1)
    interior = (ys >= b) & (ys < hl - b) & (xs >= b) & (xs < wl - b)
    cand = interior & (x > threshold) & (x > nmax)
    score_ref[0] = jnp.where(cand, x, jnp.float32(_NEG))


@functools.partial(jax.jit, static_argnames=("statics",))
def detect_scores_pallas(ldet: jax.Array, statics) -> jax.Array:
    """ldet (..., L, H0, W0) -> masked candidate scores, same shape."""
    cfg = statics.config
    L = statics.num_levels
    h0, w0 = statics.h0, statics.w0
    lead = ldet.shape[:-3]
    flat = ldet.reshape(-1, h0, w0)
    n = flat.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # border, level heights, level widths
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h0, w0), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h0, w0), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    scores = pl.pallas_call(
        functools.partial(
            _score_kernel, threshold=float(cfg.detector_threshold), L=L
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h0, w0), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(
        jnp.asarray(statics.borders, jnp.int32),
        jnp.asarray(statics.heights, jnp.int32),
        jnp.asarray(statics.widths, jnp.int32),
        flat,
    )
    return scores.reshape(*lead, L, h0, w0)
