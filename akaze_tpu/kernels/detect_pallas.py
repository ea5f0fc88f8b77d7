"""Fused Pallas detect kernel: scores + dense sub-pixel fields, one pass.

The XLA candidate pass materializes the 8-neighbor max (8 shifted compares
over the full (L, H0, W0) stack) and then the masked score — several full
HBM round trips.  This kernel reads each level once in VMEM and emits:

  * the final candidate score map (threshold + strict 3x3 max + static
    interior bounds) that feeds `approx_max_k` directly, and
  * dense sub-pixel offset fields (ox, oy) from the 2-variable quadratic
    fit on the same 3x3 neighborhood (SURVEY.md §2 C9), with rejected
    fits (|det| ~ 0 or |offset| > 1) encoded as NaN.

Computing the fit densely costs a handful of VPU ops per pixel but lets
the detect stage gather TWO values per candidate instead of NINE scattered
Ldet reads — the round-2 profile showed those gathers dominating the
detect stage (27.7 of 30 ms per 16-frame VGA batch).

Grid: one program per (frame, level); per-level interior bounds arrive via
scalar prefetch.  Score semantics identical to frontend/detect
.find_candidates' construction (same -3e38 sentinel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # python float: jnp constants cannot be captured by kernels


def _detect_kernel(
    border_ref, hs_ref, ws_ref, ldet_ref, score_ref, ox_ref, oy_ref,
    *, threshold, L,
):
    from akaze_tpu.kernels.fed_pallas import _shift_x, _shift_y

    lvl = jax.lax.rem(pl.program_id(0), L)
    x = ldet_ref[0]  # (H0, W0)
    h0, w0 = x.shape

    # 3x3 neighborhood via aligned roll+select shifts (edge replicate;
    # boundary values never win inside the interior mask, and candidates
    # are interior so the sub-pixel fit only ever sees true neighbors).
    def sh(dy, dx):
        return _shift_x(_shift_y(x, dy - 1), dx - 1)

    n_e, n_w = sh(1, 2), sh(1, 0)
    n_s, n_n = sh(2, 1), sh(0, 1)
    n_se, n_nw = sh(2, 2), sh(0, 0)
    n_ne, n_sw = sh(0, 2), sh(2, 0)
    nmax = jnp.maximum(n_e, n_w)
    nmax = jnp.maximum(nmax, jnp.maximum(n_s, n_n))
    nmax = jnp.maximum(nmax, jnp.maximum(n_se, n_nw))
    nmax = jnp.maximum(nmax, jnp.maximum(n_ne, n_sw))

    b = border_ref[lvl]
    hl = hs_ref[lvl]
    wl = ws_ref[lvl]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h0, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, w0), 1)
    interior = (ys >= b) & (ys < hl - b) & (xs >= b) & (xs < wl - b)
    cand = interior & (x > threshold) & (x > nmax)
    score_ref[0] = jnp.where(cand, x, jnp.float32(_NEG))

    # Dense 2-var quadratic fit (same finite differences as
    # frontend/detect.subpixel_refine, f32 throughout).
    dxv = 0.5 * (n_e - n_w)
    dyv = 0.5 * (n_s - n_n)
    dxx = n_e + n_w - 2.0 * x
    dyy = n_s + n_n - 2.0 * x
    dxy = 0.25 * (n_se + n_nw - n_ne - n_sw)
    det = dxx * dyy - dxy * dxy
    safe_det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    ox = (-dxv * dyy + dyv * dxy) / safe_det
    oy = (-dyv * dxx + dxv * dxy) / safe_det
    keep = (jnp.abs(det) >= 1e-30) & (jnp.abs(ox) <= 1.0) & (jnp.abs(oy) <= 1.0)
    nan = jnp.float32(jnp.nan)
    ox_ref[0] = jnp.where(keep, ox, nan)
    oy_ref[0] = jnp.where(keep, oy, nan)


@functools.partial(jax.jit, static_argnames=("statics",))
def detect_scores_pallas(ldet: jax.Array, statics):
    """ldet (..., L, H0, W0) -> (scores, ox, oy), each the same shape.

    scores: masked candidate scores (-3e38 sentinel); ox/oy: sub-pixel
    offsets per pixel, NaN where the quadratic fit is rejected."""
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
        out_specs=[
            pl.BlockSpec(
                (1, h0, w0), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ] * 3,
    )
    scores, ox, oy = pl.pallas_call(
        functools.partial(
            _detect_kernel, threshold=float(cfg.detector_threshold), L=L
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, h0, w0), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(
        jnp.asarray(statics.borders, jnp.int32),
        jnp.asarray(statics.heights, jnp.int32),
        jnp.asarray(statics.widths, jnp.int32),
        flat,
    )
    reshape = lambda a: a.reshape(*lead, L, h0, w0)
    return reshape(scores), reshape(ox), reshape(oy)
