"""Compact scale-space atlas layout (round-3 groundwork, BASELINE.md
"Known perf headroom").

The pipeline currently materializes every per-level channel as a zero-padded
`(L, H0, W0)` stack (SURVEY.md §7.1): uniform shapes make downstream gathers
trivial, but deep-octave levels waste 4x/16x/64x HBM.  This module plans the
replacement layout: all L levels packed into ONE `(H_atlas, W0)` canvas by
vertical stacking — level l occupies rows `[y_off[l], y_off[l] + h_l)` at
its native width — which costs ~1.9x H0 rows for the default 4x4 config
instead of L = 16 full planes (~2.1x less HBM).  Gather sites translate with
one add: `(l, y, x) -> (y_off[l] + y, x)`, so the detect/describe gather
code stays a single indexed op over a static layout.

Guard rows between levels (rounded so every level starts on an f32 sublane
boundary) keep 3x3 stencil reads from crossing level boundaries; pack fills
them with edge-replicated rows so neighborhood ops at a level's first/last
row see the same values replicate-padding would produce.

Not yet wired into the pipeline — `pack_stack`/`unpack_level` bridge the
existing stack layout for migration and parity testing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# f32 sublane count on TPU: level row offsets are rounded to multiples of
# this so each level's rows start tile-aligned in the atlas.
_SUBLANES = 8


class AtlasLayout(NamedTuple):
    """Static (trace-time) description of the packed scale-space canvas."""

    y_off: np.ndarray  # (L,) int32 first atlas row of each level
    heights: np.ndarray  # (L,) int32 native level heights
    widths: np.ndarray  # (L,) int32 native level widths
    total_rows: int  # H_atlas (sublane-aligned)
    width: int  # W0 (atlas width = octave-0 width)

    @property
    def num_levels(self) -> int:
        return len(self.y_off)

    def level_slice(self, l: int) -> tuple[slice, slice]:
        """Row/col slices of level l inside the atlas canvas."""
        return (
            slice(int(self.y_off[l]), int(self.y_off[l]) + int(self.heights[l])),
            slice(0, int(self.widths[l])),
        )


def plan_atlas(statics, tail_rows: int = 0) -> AtlasLayout:
    """Build the packed layout for a `ScaleSpaceStatics` (or anything with
    `heights`/`widths`/`h0`/`w0` arrays).

    `tail_rows`: extra guard rows after the last level (sublane-rounded) so
    fixed-size `dynamic_slice` patch windows anchored inside the last level
    never clamp against the atlas bottom (pass the patch height)."""
    heights = np.asarray(statics.heights, np.int32)
    widths = np.asarray(statics.widths, np.int32)
    y_off = np.zeros(len(heights), np.int32)
    row = 0
    for l, h in enumerate(heights):
        y_off[l] = row
        # One guard row below each level, then round the next level's start
        # up to a sublane boundary (the guard band is >= 1 row).
        row = int(-(-(row + int(h) + 1) // _SUBLANES) * _SUBLANES)
    if tail_rows:
        row = int(-(-(row + int(tail_rows)) // _SUBLANES) * _SUBLANES)
    return AtlasLayout(
        y_off=y_off,
        heights=heights,
        widths=widths,
        total_rows=row,
        width=int(statics.w0),
    )


def to_atlas_rows(layout: AtlasLayout, level, y):
    """Level-local row coordinate(s) -> atlas row coordinate(s).

    `level`/`y` may be scalars or broadcast-compatible integer arrays
    (traced or static); columns are unchanged by the layout."""
    y_off = jnp.asarray(layout.y_off)
    return y_off[level] + y


def pack_stack(stack: jax.Array, layout: AtlasLayout) -> jax.Array:
    """(..., L, H0, W0) zero-padded stack -> (..., H_atlas, W0) atlas.

    Guard rows replicate each level's last valid row (columns beyond a
    level's width keep the stack's zero padding), so 3x3 neighborhoods at
    level edges match replicate-padding semantics."""
    L = layout.num_levels
    parts = []
    for l in range(L):
        h = int(layout.heights[l])
        level = stack[..., l, :h, :]
        parts.append(level)
        start = int(layout.y_off[l])
        end = int(layout.y_off[l + 1]) if l + 1 < L else layout.total_rows
        guard = end - (start + h)
        if guard:
            last = stack[..., l, h - 1 : h, :]
            parts.append(jnp.repeat(last, guard, axis=-2))
    return jnp.concatenate(parts, axis=-2)


def pack_levels(levels, layout: AtlasLayout) -> jax.Array:
    """Native-resolution level arrays [(..., h_l, w_l), ...] -> atlas.

    The round-3 production path: packs straight from the per-level builder
    outputs without ever materializing the zero-padded (L, H0, W0) stack.
    Columns beyond a level's width are zero; guard rows replicate the
    level's last (zero-extended) row, matching `pack_stack` semantics."""
    L = layout.num_levels
    parts = []
    for l in range(L):
        level = levels[l]
        h, w = int(layout.heights[l]), int(layout.widths[l])
        pad = [(0, 0)] * (level.ndim - 1) + [(0, layout.width - w)]
        row_padded = jnp.pad(level, pad) if layout.width > w else level
        parts.append(row_padded)
        start = int(layout.y_off[l])
        end = int(layout.y_off[l + 1]) if l + 1 < L else layout.total_rows
        guard = end - (start + h)
        if guard:
            parts.append(jnp.repeat(row_padded[..., h - 1 : h, :], guard, axis=-2))
    return jnp.concatenate(parts, axis=-2)


def build_scale_space_atlas(img: jax.Array, statics) -> dict:
    """Atlas-packed scale space: dict of (H_atlas, W0) arrays Lt, Lx, Ly,
    Ldet — the compact counterpart of `scale_space.build_scale_space`,
    built from the same per-level chain without the padded stack."""
    from akaze_tpu.frontend.scale_space import (
        build_levels, detector_response_level,
    )

    layout = plan_atlas(statics)
    lts, lsmooths = build_levels(img, statics.specs, statics.config)
    lxs, lys, ldets = [], [], []
    for lsmooth, spec in zip(lsmooths, statics.specs):
        lx, ly, ldet = detector_response_level(lsmooth, spec)
        lxs.append(lx)
        lys.append(ly)
        ldets.append(ldet)
    return {
        "Lt": pack_levels(lts, layout),
        "Lx": pack_levels(lxs, layout),
        "Ly": pack_levels(lys, layout),
        "Ldet": pack_levels(ldets, layout),
    }


def unpack_level(atlas: jax.Array, layout: AtlasLayout, l: int) -> jax.Array:
    """Atlas -> native-resolution (..., h_l, w_l) view of level l."""
    rows, cols = layout.level_slice(l)
    return atlas[..., rows, cols]


def atlas_bytes_ratio(layout: AtlasLayout, h0: int) -> float:
    """Stack HBM bytes / atlas HBM bytes (the expected memory win)."""
    return (layout.num_levels * h0) / float(layout.total_rows)


def plan_row_levels(layout: AtlasLayout) -> np.ndarray:
    """Static (H_atlas,) int32 owning-level id per atlas row (guard rows
    belong to the level above them; they are never candidates)."""
    row_level = np.zeros(layout.total_rows, np.int32)
    for l in range(layout.num_levels):
        start = int(layout.y_off[l])
        end = (
            int(layout.y_off[l + 1])
            if l + 1 < layout.num_levels
            else layout.total_rows
        )
        row_level[start:end] = l
    return row_level


def atlas_candidates(score_atlas: jax.Array, layout: AtlasLayout, k: int):
    """Top-k candidate sites over the packed score plane.

    Returns (score, level, y, x, valid) arrays of length k: one exact
    `lax.top_k` over the single (H_atlas * W0) plane — ~2.1x less input
    than the stacked equivalent — with static row->level decoding."""
    w = layout.width
    flat = score_atlas.reshape(-1)
    score, idx = jax.lax.top_k(flat, k)
    row = idx // w
    x = idx % w
    level = jnp.asarray(plan_row_levels(layout))[row]
    y = row - jnp.asarray(layout.y_off)[level]
    return score, level, y, x, score > jnp.float32(_NEG / 2)


def atlas_extract_patches(
    planes: jax.Array, layout: AtlasLayout, level, y0, x0, ph: int, pw: int
) -> jax.Array:
    """Per-keypoint patch windows from packed channel planes.

    planes: (ch, H_atlas, W0); level/y0/x0: (C,) per-keypoint level id and
    level-local patch origin (as produced by the describe stage: origins
    clipped so every CONSUMED sample coordinate stays inside the level).
    Returns (C, ch, ph, pw) — the atlas counterpart of the stacked
    `dynamic_slice(stacks, (0, l, y, x), ...)` gather, one dimension
    cheaper.  Plan the layout with `tail_rows >= ph` so windows anchored in
    the last level never clamp against the atlas bottom; rows a window
    covers beyond its level's height are guard slop that the one-hot
    samplers never select (sample coords are clipped to the level)."""
    ch = planes.shape[0]
    y_off = jnp.asarray(layout.y_off)

    def slice_one(l, y, x):
        return jax.lax.dynamic_slice(planes, (0, y_off[l] + y, x), (ch, ph, pw))

    return jax.vmap(slice_one)(level, y0, x0)


def plan_interior_mask(layout: AtlasLayout, borders) -> np.ndarray:
    """Static (H_atlas, W0) mask of per-level interior sites (inside each
    level's detection border); guard rows are all-False."""
    borders = np.asarray(borders, np.int64)
    mask = np.zeros((layout.total_rows, layout.width), bool)
    for l in range(layout.num_levels):
        b = int(borders[l])
        h, w = int(layout.heights[l]), int(layout.widths[l])
        y0 = int(layout.y_off[l])
        mask[y0 + b : y0 + h - b, b : w - b] = True
    return mask


_NEG = -3.0e38  # candidate-score sentinel (same as frontend/detect)


def atlas_score_fields(ldet_atlas: jax.Array, interior_mask, threshold: float):
    """Candidate scores + sub-pixel offset fields for ALL levels in one
    dense 3x3 pass over the packed atlas (the round-3 replacement for the
    per-level `kernels.fed_pallas._dense_score_fields` loop).

    Correctness across level boundaries: candidates are strictly interior
    (border >= 1 per level, guard rows masked out), so no candidate's 3x3
    neighborhood or finite-difference stencil ever reads a guard row or
    another level's rows — the single dense pass is exact."""
    h, w = ldet_atlas.shape[-2], ldet_atlas.shape[-1]
    pe = jnp.pad(
        ldet_atlas, [(0, 0)] * (ldet_atlas.ndim - 2) + [(1, 1), (1, 1)], mode="edge"
    )

    def sh(dy, dx):
        return pe[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    n_e, n_w = sh(0, 1), sh(0, -1)
    n_s, n_n = sh(1, 0), sh(-1, 0)
    n_se, n_nw = sh(1, 1), sh(-1, -1)
    n_ne, n_sw = sh(-1, 1), sh(1, -1)
    nmax = jnp.maximum(n_e, n_w)
    nmax = jnp.maximum(nmax, jnp.maximum(n_s, n_n))
    nmax = jnp.maximum(nmax, jnp.maximum(n_se, n_nw))
    nmax = jnp.maximum(nmax, jnp.maximum(n_ne, n_sw))

    cand = jnp.asarray(interior_mask) & (ldet_atlas > threshold) & (ldet_atlas > nmax)
    score = jnp.where(cand, ldet_atlas, jnp.float32(_NEG))

    dxv = 0.5 * (n_e - n_w)
    dyv = 0.5 * (n_s - n_n)
    dxx = n_e + n_w - 2.0 * ldet_atlas
    dyy = n_s + n_n - 2.0 * ldet_atlas
    dxy = 0.25 * (n_se + n_nw - n_ne - n_sw)
    det = dxx * dyy - dxy * dxy
    safe_det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    ox = (-dxv * dyy + dyv * dxy) / safe_det
    oy = (-dyv * dxx + dxv * dxy) / safe_det
    keep = (jnp.abs(det) >= 1e-30) & (jnp.abs(ox) <= 1.0) & (jnp.abs(oy) <= 1.0)
    nan = jnp.float32(jnp.nan)
    return score, jnp.where(keep, ox, nan), jnp.where(keep, oy, nan)
