"""Scale-space extrema detection on the stacked scale space (SURVEY.md §2 C9).

TPU reformulation of the reference's sequential extrema pass (SURVEY.md §7.3):
the reference walks candidates in raster order mutating a Vec; here detection
is a dense masked compare + per-level `top_k`, and the same/adjacent-level
de-duplication becomes a symmetric parallel NMS:

    P is suppressed iff some candidate Q with |level(Q) - level(P)| <= 1 lies
    within radius r = 0.5 * size[max(level_P, level_Q)] (exactly the radius
    the reference uses for that pair) and beats P on (response, earlier
    raster/level order) — reproducing the reference's "higher response wins,
    earlier point wins ties" outcome without the sequential chain.

Chain effects (a replaced point un-suppressing a third) are not reproduced;
parity vs the golden sequential model is gated tolerantly (SURVEY.md §7.3
"verify it doesn't break parity gates").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.core.types import Keypoints
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics

_NEG = jnp.float32(-3.0e38)


def _neighbor_max_3x3(ldet: jax.Array) -> jax.Array:
    """Max over the 8 spatial neighbors per level (center excluded)."""
    p = jnp.pad(ldet, [(0, 0)] * (ldet.ndim - 2) + [(1, 1), (1, 1)], constant_values=_NEG)
    shifts = [
        p[..., 0:-2, 0:-2], p[..., 0:-2, 1:-1], p[..., 0:-2, 2:],
        p[..., 1:-1, 0:-2], p[..., 1:-1, 2:],
        p[..., 2:, 0:-2], p[..., 2:, 1:-1], p[..., 2:, 2:],
    ]
    out = shifts[0]
    for s in shifts[1:]:
        out = jnp.maximum(out, s)
    return out


def find_candidates(ldet: jax.Array, statics: ScaleSpaceStatics, scores=None):
    """Per-level top-K strict 3x3 maxima above threshold.

    Returns dict of (L, K) arrays: resp, yi, xi (level-pixel ints), valid.
    """
    cfg = statics.config
    K = cfg.per_level_candidates
    w0 = statics.w0
    if scores is None:
        # Portable XLA score construction.  The batched pipeline passes
        # precomputed per-octave scores instead (computed inside the fused
        # octave kernels / _dense_score_fields — see kernels/fed_pallas).
        nmax = _neighbor_max_3x3(ldet)
        cand = (
            (ldet > cfg.detector_threshold)
            & (ldet > nmax)
            & jnp.asarray(statics.interior)
        )
        scores = jnp.where(cand, ldet, _NEG)
    flat = scores.reshape(statics.num_levels, -1)
    # approx_max_k: TPU-optimized partial reduction (~10x faster than exact
    # top_k on 300k-wide rows).  Real extrema above threshold are sparse
    # (hundreds per level), so recall at K=256 is effectively exact.
    resp, idx = jax.lax.approx_max_k(
        flat, K, recall_target=cfg.candidate_recall
    )  # (L, K)
    valid = resp > _NEG
    yi = idx // w0
    xi = idx % w0
    return {"resp": resp, "yi": yi, "xi": xi, "flat": idx, "valid": valid}


def find_candidates_batched(scores: jax.Array, statics: ScaleSpaceStatics):
    """Batched candidate selection over precomputed scores (B, L, H0, W0).

    Runs `approx_max_k` PER OCTAVE on the tight (h, w) slice of each level:
    deeper octaves occupy 1/4^o of the padded plane, so the padded-layout
    reduction wasted ~4x its work on -3e38 filler.  Returns the same
    candidate dict as find_candidates with a leading (B,) axis."""
    cfg = statics.config
    K = cfg.per_level_candidates
    B = scores.shape[0]
    w0 = statics.w0
    resp_g, yi_g, xi_g = [], [], []
    lvl = 0
    L = statics.num_levels
    while lvl < L:
        h, w = statics.heights[lvl], statics.widths[lvl]
        n = 1
        while lvl + n < L and statics.heights[lvl + n] == h:
            n += 1
        flat = scores[:, lvl : lvl + n, :h, :w].reshape(B * n, h * w)
        k = min(K, h * w)
        resp, idx = jax.lax.approx_max_k(flat, k, recall_target=cfg.candidate_recall)
        if k < K:
            resp = jnp.pad(resp, ((0, 0), (0, K - k)), constant_values=_NEG)
            idx = jnp.pad(idx, ((0, 0), (0, K - k)))
        resp_g.append(resp.reshape(B, n, K))
        yi = (idx // w).reshape(B, n, K)
        xi = (idx % w).reshape(B, n, K)
        yi_g.append(yi)
        xi_g.append(xi)
        lvl += n
    resp = jnp.concatenate(resp_g, axis=1)
    yi = jnp.concatenate(yi_g, axis=1)
    xi = jnp.concatenate(xi_g, axis=1)
    return {
        "resp": resp,
        "yi": yi,
        "xi": xi,
        "flat": yi * w0 + xi,  # index into the PADDED per-level plane
        "valid": resp > _NEG,
    }


def find_candidates_oct(oct_products, statics: ScaleSpaceStatics):
    """Candidate selection from PER-OCTAVE score arrays (round 3): each
    entry of `oct_products` carries "score" as a LEVEL-MAJOR (n, B, h, w)
    stack at native octave resolution — no padded (B, L, H0, W0) stack is
    ever materialized (measured ~0.4 ms/batch16 of pure HBM writes per
    padded stack).  Candidate semantics match find_candidates_batched."""
    from akaze_tpu.core.config import _env_override
    from akaze_tpu.kernels.fed_pallas import octave_groups

    cfg = statics.config
    # AKAZE_PER_LEVEL_CANDIDATES: trace-time A/B override only (config
    # field is the source of truth) — for measuring the K=512 parity/cost
    # tradeoff (tools/nms_bisect.py: the K=256 cap is the dominant
    # golden-coverage miss class on textured scenes; measured 8.7%
    # headline cost at 512, BASELINE.md round 5).
    K = _env_override(
        "AKAZE_PER_LEVEL_CANDIDATES", cfg.per_level_candidates, cast=int
    )
    w0 = statics.w0
    resp_g, yi_g, xi_g = [], [], []
    for (l0, n, h, w), prod in zip(octave_groups(statics), oct_products):
        score = prod["score"]  # level-major (n, B, h, w)
        B = score.shape[1]
        flat = score.reshape(n * B, h * w)
        k = min(K, h * w)
        resp, idx = jax.lax.approx_max_k(flat, k, recall_target=cfg.candidate_recall)
        if k < K:
            resp = jnp.pad(resp, ((0, 0), (0, K - k)), constant_values=_NEG)
            idx = jnp.pad(idx, ((0, 0), (0, K - k)))
        resp_g.append(jnp.swapaxes(resp.reshape(n, B, K), 0, 1))
        yi_g.append(jnp.swapaxes((idx // w).reshape(n, B, K), 0, 1))
        xi_g.append(jnp.swapaxes((idx % w).reshape(n, B, K), 0, 1))
    resp = jnp.concatenate(resp_g, axis=1)
    yi = jnp.concatenate(yi_g, axis=1)
    xi = jnp.concatenate(xi_g, axis=1)
    return {
        "resp": resp,
        "yi": yi,
        "xi": xi,
        "flat": yi * w0 + xi,  # padded-plane index (tie-break key only)
        "valid": resp > _NEG,
    }


def cross_level_nms(cand: dict, statics: ScaleSpaceStatics) -> jax.Array:
    """Symmetric NMS over same + adjacent levels; returns surviving mask (L, K)."""
    L = statics.num_levels
    ratios = jnp.asarray(statics.ratios)[:, None]  # (L, 1)
    x0 = cand["xi"].astype(jnp.float32) * ratios
    y0 = cand["yi"].astype(jnp.float32) * ratios
    resp = cand["resp"]
    valid = cand["valid"]
    # Unique priority key: level-major, raster order within level — the
    # reference's insertion order, used only for exact-tie breaking.
    npx = statics.h0 * statics.w0
    tie = jnp.arange(L, dtype=jnp.int32)[:, None] * np.int32(npx) + cand["flat"]
    # r^2 for each pair group: radius of the *higher* level in the pair
    # (reference pass-1/pass-2 semantics, see module docstring).
    r2 = jnp.asarray((statics.config.dedup_radius_factor * statics.sizes) ** 2)

    def shift(a, d, fill):
        """Shift along the level axis by d with fill (d = +1: level l sees l-1)."""
        if d == 1:
            return jnp.concatenate([jnp.full_like(a[:1], fill), a[:-1]], axis=0)
        return jnp.concatenate([a[1:], jnp.full_like(a[:1], fill)], axis=0)

    r2_next = jnp.pad(r2[1:], (0, 1))  # level l+1's radius, seen from level l
    groups = []
    for d, r2_pair in (
        (0, r2[:, None, None]),  # same level: own radius
        (1, r2[:, None, None]),  # Q at l-1: pair radius = level l's (P's)
        (-1, r2_next[:, None, None]),  # Q at l+1: pair radius = level l+1's
    ):
        if d == 0:
            qx, qy, qresp, qtie, qvalid = x0, y0, resp, tie, valid
        else:
            qx = shift(x0, d, 0.0)
            qy = shift(y0, d, 0.0)
            qresp = shift(resp, d, _NEG)
            qtie = shift(tie, d, jnp.int32(0))
            qvalid = shift(valid, d, False)
        dx = x0[:, :, None] - qx[:, None, :]
        dy = y0[:, :, None] - qy[:, None, :]
        close = dx * dx + dy * dy <= r2_pair
        beats = (qresp[:, None, :] > resp[:, :, None]) | (
            (qresp[:, None, :] == resp[:, :, None]) & (qtie[:, None, :] < tie[:, :, None])
        )
        groups.append(jnp.any(close & beats & qvalid[:, None, :], axis=-1))
    suppressed = groups[0] | groups[1] | groups[2]
    return valid & jnp.logical_not(suppressed)


def subpixel_from_fields(lvl, xi, yi, ox_field: jax.Array,
                         oy_field: jax.Array, statics: ScaleSpaceStatics):
    """Sub-pixel refinement from dense offset fields for the SELECTED
    keypoints (all args (M,)): two gathers per keypoint instead of nine
    scattered Ldet reads.  Rejected fits arrive as NaN.  Running this after
    top-M selection matches the reference order exactly (golden/akaze.py:238
    refines the kept set and discards |offset| > 1 without backfilling) and
    gathers 4x fewer elements than refining every candidate.  Multi-dim
    indexing (no reshape) keeps the stacked fields in their producer layout
    — a flat reshape of the level-stacked plane forces a relayout copy."""
    ox = ox_field[lvl, yi, xi]
    oy = oy_field[lvl, yi, xi]
    keep = jnp.logical_not(jnp.isnan(ox))
    ox = jnp.where(keep, ox, 0.0)
    oy = jnp.where(keep, oy, 0.0)
    ratios = jnp.asarray(statics.ratios)[lvl]
    xf = (xi.astype(jnp.float32) + ox) * ratios
    yf = (yi.astype(jnp.float32) + oy) * ratios
    return xf, yf, keep


def subpixel_from_fields_oct(lvl, xi, yi, oct_products,
                             statics: ScaleSpaceStatics):
    """subpixel_from_fields over PER-OCTAVE (n, h, w) PACKED offset fields
    (one frame): ONE int32 gather per octave + masked select — the round-3
    version gathered separate f32 ox and oy planes (8 gathers across 4
    octaves, ~1.9 ms of the 13 ms batch-16 device step); the packed field
    (kernels/fed_pallas.pack_sub, 1/16000-px quantization) halves both the
    gathers and the field write traffic."""
    from akaze_tpu.kernels.fed_pallas import octave_groups, unpack_sub

    packed = jnp.full(lvl.shape, -1, jnp.int32)
    for (l0, n, h, w), prod in zip(octave_groups(statics), oct_products):
        sel = (lvl >= l0) & (lvl < l0 + n)
        li = jnp.clip(lvl - l0, 0, n - 1)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        packed = jnp.where(sel, prod["sub"][li, yc, xc], packed)
    ox, oy, keep = unpack_sub(packed)
    ox = jnp.where(keep, ox, 0.0)
    oy = jnp.where(keep, oy, 0.0)
    ratios = jnp.asarray(statics.ratios)[lvl]
    xf = (xi.astype(jnp.float32) + ox) * ratios
    yf = (yi.astype(jnp.float32) + oy) * ratios
    return xf, yf, keep


def subpixel_refine(lvl, y, x, ldet: jax.Array, statics: ScaleSpaceStatics):
    """2-var quadratic fit on Ldet for the SELECTED keypoints (lvl/y/x all
    (M,)); reject |offset| > 1 (SURVEY.md §2 C9).  Runs after top-M
    selection like the reference (golden/akaze.py:238: refine the kept set,
    discard rejects without backfill).  Returns octave-0 (x, y) + keep."""

    def at(dy, dx):
        return ldet[lvl, y + dy, x + dx]

    v = at(0, 0)
    dxv = 0.5 * (at(0, 1) - at(0, -1))
    dyv = 0.5 * (at(1, 0) - at(-1, 0))
    dxx = at(0, 1) + at(0, -1) - 2.0 * v
    dyy = at(1, 0) + at(-1, 0) - 2.0 * v
    dxy = 0.25 * (at(1, 1) + at(-1, -1) - at(-1, 1) - at(1, -1))
    det = dxx * dyy - dxy * dxy
    safe_det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    ox = (-dxv * dyy + dyv * dxy) / safe_det
    oy = (-dyv * dxx + dxv * dxy) / safe_det
    keep = (jnp.abs(det) >= 1e-30) & (jnp.abs(ox) <= 1.0) & (jnp.abs(oy) <= 1.0)
    ratios = jnp.asarray(statics.ratios)[lvl]
    xf = (x.astype(jnp.float32) + ox) * ratios
    yf = (y.astype(jnp.float32) + oy) * ratios
    return xf, yf, keep


def detect(
    ldet: jax.Array, statics: ScaleSpaceStatics, scores=None, subpix=None,
    cand=None, subpix_oct=None,
) -> Keypoints:
    """Full detection: candidates -> NMS -> sub-pixel -> global top-K SoA.

    scores/subpix: optional precomputed candidate scores and dense (ox, oy)
    sub-pixel fields (from kernels/fed_pallas's score-field constructions);
    cand: optional precomputed candidate dict (find_candidates_batched /
    find_candidates_oct); subpix_oct: per-octave detect products from the
    with_detect builder (ldet may be None when cand and a subpix source are
    both given)."""
    cfg = statics.config
    if cand is None:
        cand = find_candidates(ldet, statics, scores)
    else:
        cand = dict(cand)
    cand["valid"] = cross_level_nms(cand, statics)

    L, K = cand["valid"].shape
    flat_valid = cand["valid"].reshape(-1)
    flat_resp = jnp.where(flat_valid, cand["resp"].reshape(-1), _NEG)
    M = cfg.max_keypoints
    # Small images can have fewer candidate slots than the output capacity.
    k = min(M, L * K)
    top_resp, order = jax.lax.top_k(flat_resp, k)
    if k < M:
        top_resp = jnp.pad(top_resp, (0, M - k), constant_values=_NEG)
        order = jnp.pad(order, (0, M - k))

    # ONE gather for (level, yi, xi) of the selected candidates: the
    # padded-plane tie key lvl*npx + yi*w0 + xi is a bijective encoding,
    # so three 16k-row gathers (each ~0.17 ms at batch 16 on v5e) collapse
    # into one + cheap ALU.
    npx = statics.h0 * statics.w0
    # Static-shape overflow guard (round-4 advisor): the packed int32 key
    # silently corrupts coords once npx * L >= 2^31 (~8.4 MP padded plane
    # at L = 16).  All quantities are trace-time Python ints.
    assert npx * L < 2**31, (
        f"packed candidate key overflows int32: {npx} px * {L} levels"
    )
    w0 = statics.w0
    lvl = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, K))
    packed = lvl * jnp.int32(npx) + cand["flat"]
    sel = packed.reshape(-1)[order]
    class_id = sel // npx
    rem = sel - class_id * npx
    yi = rem // w0
    xi = rem - yi * w0

    # Sub-pixel refinement AFTER selection, on the M winners only — the
    # reference order (golden/akaze.py:238): rejected fits are discarded
    # without backfilling lower-response candidates into the freed slots.
    if subpix_oct is not None:
        xf, yf, keep = subpixel_from_fields_oct(
            class_id, xi, yi, subpix_oct, statics
        )
    elif subpix is not None:
        xf, yf, keep = subpixel_from_fields(
            class_id, xi, yi, subpix[0], subpix[1], statics
        )
    else:
        xf, yf, keep = subpixel_refine(class_id, yi, xi, ldet, statics)

    sizes = jnp.asarray(statics.sizes)
    octaves = jnp.asarray(statics.octaves)
    return Keypoints(
        x=xf,
        y=yf,
        response=top_resp,
        size=sizes[class_id],
        octave=octaves[class_id],
        class_id=class_id,
        angle=jnp.zeros((M,), jnp.float32),
        valid=(top_resp > _NEG) & keep,
    )
