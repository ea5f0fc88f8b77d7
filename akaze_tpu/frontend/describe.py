"""Orientation + M-LDB binary descriptor on the stacked scale space.

Reference behavior (SURVEY.md §2 C10/C11): SURF-style dominant orientation
from Lx/Ly samples on a discrete circle; M-LDB = per-cell means of
(Lt, rotated Lx, rotated Ly) over 2x2/3x3/4x4 grids of a rotated patch,
pairwise-compared into 486 bits (61 bytes, LSB-first).

TPU-first design (SURVEY.md §7.3 "M-LDB sampling"):
  * Scattered per-sample gathers are hostile to the TPU memory system, so
    sampling is restructured: one aligned (PH, PW) patch per keypoint is
    sliced out of the level stack (a contiguous block fetch), and
    nearest-pixel sampling becomes **one-hot matmuls on the MXU**:
        B = patch @ Rx^T  (column select),   S = sum_h Ry ⊙ B^T (row select)
    with Rx/Ry exact {0,1} f32 one-hots built from the reference's
    round-half-up sample coordinates — bit-exact sampling, zero gathers.
  * The patch is sized from the worst-case per-level sampling scale
    (static), and keypoints are processed in fixed chunks via lax.map to
    bound the live one-hot/patch memory.
  * Cell means are a static one-hot matmul; bit packing is two small
    matmuls.  No per-keypoint loops anywhere.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.core.types import Features, Keypoints
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics


def _round_half_up(x: jax.Array) -> jax.Array:
    return jnp.floor(x + 0.5).astype(jnp.int32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _per_level_scale(ss_statics: ScaleSpaceStatics) -> np.ndarray:
    """Reference `scale = max(1, fRound(0.5 * size / ratio))` — static/level."""
    s = np.floor(0.5 * ss_statics.sizes / ss_statics.ratios + 0.5).astype(np.int32)
    return np.maximum(s, 1)


class DescribeStatics:
    """Compile-time sampling patterns shared by orientation and M-LDB."""

    def __init__(self, config: AkazeConfig, ss_statics: ScaleSpaceStatics):
        self.config = config
        # --- orientation circle: |(i, j)| < 6, Gaussian sigma_w = 2.5 ---
        offs = [(i, j) for i in range(-6, 7) for j in range(-6, 7) if i * i + j * j < 36]
        self.ori_di = np.array([o[0] for o in offs], np.float32)  # x-ish
        self.ori_dj = np.array([o[1] for o in offs], np.float32)  # y-ish
        self.ori_w = np.exp(
            -(self.ori_di**2 + self.ori_dj**2) / (2.0 * 2.5 * 2.5)
        ).astype(np.float32)
        # Sliding pi/3 windows starting every 0.15 rad (reference loop).
        ang1 = np.arange(0.0, 2.0 * math.pi, 0.15)
        self.win_lo = ang1.astype(np.float32)
        self.win_hi = (ang1 + math.pi / 3.0).astype(np.float32)
        self.win_wrap = self.win_hi > 2.0 * math.pi

        # --- M-LDB grids: the 2x2/3x3/4x4 grids sample overlapping integer
        # pattern offsets (441 unique of 1241 total for p=10), so sampling
        # runs ONCE over the unique offsets and each grid's cell means are a
        # static (unique, cells) mean-matrix matmul over those samples. ---
        p = config.descriptor_pattern_size
        unique: dict[tuple, int] = {}
        self.grids = []
        raw_grids = []
        for step in (p, int(math.ceil(2.0 * p / 3.0)), p // 2):
            entries = []  # (unique_idx, cell_idx)
            ci = 0
            for i in range(-p, p, step):
                for j in range(-p, p, step):
                    for k in range(i, i + step):
                        for l in range(j, j + step):
                            u = unique.setdefault((k, l), len(unique))
                            entries.append((u, ci))
                    ci += 1
            raw_grids.append((entries, ci, step))
        n_unique = len(unique)
        for entries, n_cells, step in raw_grids:
            mean_mat = np.zeros((n_unique, n_cells), np.float32)
            for u, c in entries:
                mean_mat[u, c] += 1.0
            mean_mat /= mean_mat.sum(axis=0, keepdims=True)  # mean, not sum
            pa, pb = np.triu_indices(n_cells, k=1)
            # Reference pair order is a-major (a < b) — triu_indices matches.
            self.grids.append(
                dict(
                    mean_mat=mean_mat,
                    pa=pa.astype(np.int32),
                    pb=pb.astype(np.int32),
                )
            )
        self.total_bits = config.descriptor_bits
        offs = np.array(sorted(unique, key=unique.get), np.float32)
        self.all_offk = offs[:, 0]
        self.all_offl = offs[:, 1]
        self.n_samples = n_unique

        # --- patch geometry (static): worst-case reach of any sample ---
        s_max = int(_per_level_scale(ss_statics).max())
        reach = int(math.ceil(p * s_max * math.sqrt(2.0))) + 2  # +rounding slack
        reach = max(reach, 6 * s_max + 2)  # orientation circle reach
        self.reach = reach
        self.ph = min(_round_up(2 * reach, 8), ss_statics.h0)
        self.pw = min(_round_up(2 * reach, 64), ss_statics.w0)
        # Keypoint chunk size for lax.map (bounds live one-hot memory).
        self.chunk = 256

        # --- Pallas patch geometry: HBM->VMEM DMA origins must be tile-
        # aligned (y0 % 8 == 0, x0 % 128 == 0), so origins snap down to tile
        # boundaries and the patch grows to keep every sample covered. ---
        m = reach + 1  # rounding margin
        self.pallas_h0 = _round_up(ss_statics.h0, 8)
        self.pallas_w0 = _round_up(ss_statics.w0, 128)
        ph = _round_up(8 + _round_up(m, 8) + m, 8)
        if m <= 64:
            pw = 256  # conditional block selection covers [cx-m, cx+m]
        else:
            pw = _round_up(128 + _round_up(m, 128) + m, 128)
        self.pallas_ph = min(ph, self.pallas_h0)
        self.pallas_pw = min(pw, self.pallas_w0)


def _sample_matmul(patches: jax.Array, py: jax.Array, px: jax.Array) -> jax.Array:
    """MXU one-hot sampling: patches (C, ch, PH, PW), py/px (C, S) patch-local
    int coords -> samples (C, ch, S).

    B = patch @ Rx^T selects columns; the row selection contracts with the
    Ry one-hot (fused broadcast-compare-multiply-reduce, no gather)."""
    C, ch, PH, PW = patches.shape
    S = py.shape[-1]
    rx = (px[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, PW), 2)).astype(
        patches.dtype
    )  # (C, S, PW)
    # (C, ch, PH, PW) @ (C, PW, S) -> (C, ch, PH, S)
    b = jnp.einsum("cehw,csw->cehs", patches, rx, preferred_element_type=jnp.float32)
    ry = (py[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, PH), 2)).astype(
        patches.dtype
    )  # (C, S, PH)
    return jnp.einsum("cehs,csh->ces", b, ry, preferred_element_type=jnp.float32)


def _chunk_geometry(chunk: dict, ss_statics, d_statics):
    """Per-keypoint level geometry + patch origins for one chunk.

    Shared by the XLA slice path and the Pallas patch-gather path so both
    fetch byte-identical windows.  Patch origin: every clipped sample
    coordinate lands inside the patch (clip(sample, 0, dim-1) is within
    [origin, origin+P) for all reach cases; see d_statics patch-geometry
    derivation)."""
    lvl = chunk["class_id"]
    ratios = jnp.asarray(ss_statics.ratios)[lvl]
    scales = jnp.asarray(_per_level_scale(ss_statics))[lvl].astype(jnp.float32)
    widths = jnp.asarray(ss_statics.widths)[lvl]
    heights = jnp.asarray(ss_statics.heights)[lvl]
    xf = chunk["x"] / ratios
    yf = chunk["y"] / ratios
    PH, PW = d_statics.ph, d_statics.pw
    y0 = jnp.clip(_round_half_up(yf) - PH // 2, 0, jnp.maximum(heights - PH, 0))
    x0 = jnp.clip(_round_half_up(xf) - PW // 2, 0, jnp.maximum(widths - PW, 0))
    return lvl, scales, widths, heights, xf, yf, y0, x0


def _describe_chunk(
    chunk: dict, stacks3, ss_statics, d_statics, patches: jax.Array | None = None
):
    """Orientation + descriptor for one keypoint chunk.

    chunk: dict of (C,) keypoint fields; stacks3: (3, L, H0, W0) = Lt, Lx, Ly
    (or (F, 3, L, H0, W0) with a per-chunk "frame" field).  When `patches`
    is given (Pallas gather path), stacks3 is unused and may be None.
    Returns (angles (C,), descriptors (C, nwords) uint32).
    """
    cfg = d_statics.config
    lvl, scales, widths, heights, xf, yf, y0, x0 = _chunk_geometry(
        chunk, ss_statics, d_statics
    )
    PH, PW = d_statics.ph, d_statics.pw

    if patches is None:
        if stacks3.ndim == 5:  # batched stacks (F,3,L,H0,W0) + per-kp frame

            def slice_one(f, l, y, x):
                return jax.lax.dynamic_slice(
                    stacks3, (f, 0, l, y, x), (1, 3, 1, PH, PW)
                )[0, :, 0]

            frame = jnp.broadcast_to(chunk["frame"], lvl.shape)
            patches = jax.vmap(slice_one)(frame, lvl, y0, x0)
        else:

            def slice_one(l, y, x):
                return jax.lax.dynamic_slice(
                    stacks3, (0, l, y, x), (3, 1, PH, PW)
                )[:, 0]

            patches = jax.vmap(slice_one)(lvl, y0, x0)  # (C, 3, PH, PW)

    def clip_local(gy, gx):
        """Global sample coords -> clipped patch-local int coords."""
        iy = jnp.clip(_round_half_up(gy), 0, heights[:, None] - 1) - y0[:, None]
        ix = jnp.clip(_round_half_up(gx), 0, widths[:, None] - 1) - x0[:, None]
        return iy, ix

    # ---------------- orientation (SURVEY.md §2 C10) ----------------
    di = jnp.asarray(d_statics.ori_di)[None, :]
    dj = jnp.asarray(d_statics.ori_dj)[None, :]
    oy, ox = clip_local(
        yf[:, None] + dj * scales[:, None], xf[:, None] + di * scales[:, None]
    )
    s_ori = _sample_matmul(patches[:, 1:], oy, ox)  # (C, 2, S) — Lx, Ly
    w = jnp.asarray(d_statics.ori_w)[None, :]
    rx = w * s_ori[:, 0]
    ry = w * s_ori[:, 1]
    ang = jnp.mod(jnp.arctan2(ry, rx), 2.0 * math.pi)  # (C, S)

    lo = jnp.asarray(d_statics.win_lo)[None, :, None]
    hi = jnp.asarray(d_statics.win_hi)[None, :, None]
    wrap = jnp.asarray(d_statics.win_wrap)[None, :, None]
    a = ang[:, None, :]
    inside = jnp.where(wrap, (a > lo) | (a < hi - 2.0 * math.pi), (a > lo) & (a < hi))
    sum_x = jnp.sum(jnp.where(inside, rx[:, None, :], 0.0), axis=-1)
    sum_y = jnp.sum(jnp.where(inside, ry[:, None, :], 0.0), axis=-1)
    norm = sum_x * sum_x + sum_y * sum_y
    best = jnp.argmax(norm, axis=-1)
    rows = jnp.arange(best.shape[0])
    angle = jnp.mod(jnp.arctan2(sum_y[rows, best], sum_x[rows, best]), 2.0 * math.pi)

    # ---------------- M-LDB descriptor (SURVEY.md §2 C11) ----------------
    co = jnp.cos(angle)[:, None]
    si = jnp.sin(angle)[:, None]
    offk = jnp.asarray(d_statics.all_offk)[None, :]
    offl = jnp.asarray(d_statics.all_offl)[None, :]
    sy = yf[:, None] + (offl * co + offk * si) * scales[:, None]
    sx = xf[:, None] + (-offl * si + offk * co) * scales[:, None]
    py, px = clip_local(sy, sx)
    s_all = _sample_matmul(patches, py, px)  # (C, 3, S_total)
    ri = s_all[:, 0]
    gx = s_all[:, 1]
    gy = s_all[:, 2]
    dx = gx * co + gy * si  # gradient channels rotated into keypoint frame
    dy = -gx * si + gy * co

    bit_groups = []
    for grid in d_statics.grids:
        mean_mat = jnp.asarray(grid["mean_mat"])  # (unique, cells)
        means = jnp.stack(
            [ch @ mean_mat for ch in (ri, dx, dy)], axis=0
        )  # (3, C, cells) channel-major like the reference bit order
        pa = jnp.asarray(grid["pa"])
        pb = jnp.asarray(grid["pb"])
        bits = means[:, :, pa] > means[:, :, pb]  # (3, C, P)
        bit_groups.append(jnp.moveaxis(bits, 0, 1).reshape(bits.shape[1], -1))
    allbits = jnp.concatenate(bit_groups, axis=-1)  # (C, 486)

    # Pack LSB-first into bytes, then little-endian uint32 words.
    nbytes = cfg.descriptor_bytes
    nwords = cfg.descriptor_words
    pad = nbytes * 8 - allbits.shape[-1]
    padded = jnp.pad(allbits.astype(jnp.uint32), ((0, 0), (0, pad)))
    bytes_ = jnp.sum(
        padded.reshape(-1, nbytes, 8) << jnp.arange(8, dtype=jnp.uint32), axis=-1
    )
    wpad = nwords * 4 - nbytes
    bytes_ = jnp.pad(bytes_, ((0, 0), (0, wpad)))
    words = jnp.sum(
        bytes_.reshape(-1, nwords, 4) << jnp.arange(0, 32, 8, dtype=jnp.uint32),
        axis=-1,
    )
    return angle, words.astype(jnp.uint32)


def _patch_backend(config: AkazeConfig) -> str:
    """Patch-fetch backend: "pallas" = pipelined DMA gather kernel
    (kernels/patch_pallas, bit-identical output, measured much faster than
    the sequential XLA slice loop on v5e); "xla" = vmapped dynamic_slice.
    Source of truth is config.patch_backend; AKAZE_PATCH=pallas|xla is a
    trace-time A/B override."""
    from akaze_tpu.core.config import _env_override

    b = _env_override("AKAZE_PATCH", config.patch_backend, allowed=("pallas", "xla"))
    if b in ("pallas", "xla"):
        return b
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _describe_backend(config: AkazeConfig) -> str:
    """Describe backend: "fused" single-kernel describe (TPU default),
    "xla" chunked one-hot einsums, "pallas" per-keypoint kernel (measured-
    losing, kept for A/B).  Source of truth is config.describe_backend;
    AKAZE_DESCRIBE is a trace-time A/B override."""
    from akaze_tpu.core.config import _env_override

    b = _env_override(
        "AKAZE_DESCRIBE", config.describe_backend,
        allowed=("fused", "xla", "pallas"),
    )
    if b in ("fused", "xla", "pallas"):
        return b
    return "fused" if jax.default_backend() == "tpu" else "xla"


def _gather_chunk_patches(chunk, stacks, ss_statics, d_statics):
    """Pallas patch gather for one chunk (interpret-mode off-TPU so the CPU
    test mesh exercises identical semantics)."""
    from akaze_tpu.kernels.patch_pallas import gather_patches

    lvl, _, _, _, _, _, y0, x0 = _chunk_geometry(chunk, ss_statics, d_statics)
    # "frame" is per-keypoint in describe_batched (the broadcast is a no-op
    # there) and a scalar 0 only in the single-frame describe() path.
    frame = jnp.broadcast_to(chunk.get("frame", 0), lvl.shape)
    return gather_patches(
        stacks, frame, lvl, y0, x0, chunk["valid"],
        ph=d_statics.ph, pw=d_statics.pw,
        interpret=jax.default_backend() != "tpu",
    )


def describe_batched(
    kps: Keypoints,
    stacks: dict,
    ss_statics: ScaleSpaceStatics,
    d_statics: DescribeStatics,
) -> Features:
    """Batched description with runtime skip of all-invalid chunks.

    Keypoints are response-sorted per frame, so validity is a prefix: frames
    rarely fill their capacity, and whole trailing chunks are dead.  Folding
    (frame, chunk) into ONE lax.map axis makes the skip predicate a traced
    SCALAR per step, so lax.cond really skips the patch slicing and matmuls
    — work scales with actual detections (a vmap'd cond would execute both
    branches).  Leaves come in/out with a leading (B,) frame axis.

    Tradeoff (measured on v5e, batch-16 VGA): the map's sequential steps
    underutilize the chip and LOSE to the plain vmapped path there; this
    variant wins when frames carry few detections relative to capacity or
    batches are small.  The default pipeline uses the vmapped path.

    AKAZE_DESCRIBE_LOOP=while switches to a dynamic-trip-count
    lax.while_loop over live chunks only.  Measured neutral-to-+0.2 ms on
    the v5e headline (25.2 vs 25.4 ms/batch16): the map's dead-chunk cond
    steps are nearly free, so skipping them buys little; kept for regimes
    with many frames and very sparse detections.
    """
    B, M = kps.x.shape
    if _describe_backend(d_statics.config) == "fused" and M % 64 == 0:
        # Fused chunk-batched Pallas kernel: patch gather + sampling +
        # packing in one kernel (kernels/describe_fused) — default on TPU
        # (measured 21.6 -> 19.4 ms/batch16 on v5e vs the chunked XLA path;
        # kernel itself 2.6 ms vs the 8.1 ms gather+map+cond pipeline).
        from akaze_tpu.kernels.describe_fused import describe_fused

        angles, descs = describe_fused(
            kps, stacks, ss_statics, d_statics,
            interpret=jax.default_backend() != "tpu",
        )
        kps = Keypoints(
            x=kps.x, y=kps.y, response=kps.response, size=kps.size,
            octave=kps.octave, class_id=kps.class_id, angle=angles,
            valid=kps.valid,
        )
        return Features(
            keypoints=kps,
            descriptors=jnp.where(kps.valid[..., None], descs, 0),
        )
    if "lvl_oct" in stacks:
        # Non-fused backends want one padded level stack; reconstruct it
        # from the per-octave zero-copy stacks (debug/A-B path only — the
        # default TPU pipeline takes the fused branch above).
        from akaze_tpu.frontend.scale_space import stack_levels

        def restack(key):
            levels = []
            for d in stacks["lvl_oct"]:
                for i in range(d[key].shape[0]):
                    levels.append(d[key][i])
            return stack_levels(levels, ss_statics.specs, level_major=True)

        stacks = {
            "Lt": restack("Lt"), "Lx": restack("Lx"), "Ly": restack("Ly"),
            "level_major": True,
        }
    C = min(d_statics.chunk, M)
    nc = (M + C - 1) // C
    pad = nc * C - M

    # Frame grouping: fold G frames' j-th chunks into ONE map step of G*C
    # keypoints.  The chunk compute is HBM-bandwidth-bound on the one-hot
    # matmul intermediates (same traffic either way), but each lax.map step
    # pays a fixed ~40us while/cond dispatch shell — measured ~2.7 ms of the
    # 19.5 ms batch-16 headline at G=1 (64 steps).  G=8 cuts the shell 8x.
    # Liveness coarsens to the group (chunk j runs if ANY grouped frame has
    # >j*C detections) — dead-chunk skipping still works per group since
    # validity is a per-frame prefix.
    from akaze_tpu.core.config import _env_override

    G = _env_override("AKAZE_DESCRIBE_GROUP", d_statics.config.describe_group,
                      cast=int)
    # Cap G so the live one-hot/patch working set stays bounded at
    # group*chunk keypoints (G*C > ~4096 risks VMEM/HBM pressure at VGA).
    G = max(1, min(G, B, max(1, 4096 // C)))
    while B % G:
        G -= 1

    def prep(a):
        a = jnp.pad(a, ((0, 0), (0, pad))).reshape(B // G, G, nc, C)
        return jnp.swapaxes(a, 1, 2).reshape(B // G * nc, G * C)

    # (B, M) like every other keypoint field so prep()'s padding applies
    # uniformly (padded slots land on frame 0, safe: they are invalid).
    frame_ids = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, M))
    fields = {
        "x": prep(kps.x),
        "y": prep(kps.y),
        "class_id": prep(kps.class_id),
        "valid": prep(kps.valid),
        "frame": prep(frame_ids),
    }
    use_pallas_patches = _patch_backend(d_statics.config) == "pallas"
    # The Pallas gather reads Lt/Lx/Ly directly, so the (F, 3, L, H0, W0)
    # channel concat the XLA slice path needs is never materialized in HBM.
    if use_pallas_patches:
        stacks3 = None
    else:
        lt, lx, ly = stacks["Lt"], stacks["Lx"], stacks["Ly"]
        if stacks.get("level_major", False) and lt.ndim == 4:
            # Debug path (AKAZE_PATCH=xla on TPU): pay the transpose.
            lt, lx, ly = (jnp.moveaxis(a, 0, 1) for a in (lt, lx, ly))
        stacks3 = jnp.stack([lt, lx, ly], axis=1)
    nwords = d_statics.config.descriptor_words

    def live_compute(chunk):
        patches = (
            _gather_chunk_patches(chunk, stacks, ss_statics, d_statics)
            if use_pallas_patches
            else None
        )
        return _describe_chunk(
            chunk, stacks3, ss_statics, d_statics, patches=patches
        )

    loop = _env_override("AKAZE_DESCRIBE_LOOP", d_statics.config.describe_loop,
                         allowed=("map", "while", "unroll"))
    if loop == "while":
        # Dynamic-trip-count loop over LIVE chunks only: the lax.map below
        # pays the ~40us while/cond dispatch on every one of the B*nc steps
        # even when the cond's dead branch runs; here dead chunks cost
        # nothing.  Live chunks are gathered via a live-first index order.
        NC = fields["valid"].shape[0]
        live = jnp.any(fields["valid"], axis=1)
        n_live = jnp.sum(live.astype(jnp.int32))
        order = jnp.argsort(jnp.logical_not(live), stable=True).astype(
            jnp.int32
        )

        def cond_fn(st):
            return st[0] < n_live

        def body_fn(st):
            i, angs, dsc = st
            idx = order[i]
            chunk = {
                k: jax.lax.dynamic_index_in_dim(v, idx, keepdims=False)
                for k, v in fields.items()
            }
            a, d = live_compute(chunk)
            angs = jax.lax.dynamic_update_index_in_dim(angs, a, idx, 0)
            dsc = jax.lax.dynamic_update_index_in_dim(dsc, d, idx, 0)
            return i + 1, angs, dsc

        _, angles, descs = jax.lax.while_loop(
            cond_fn,
            body_fn,
            (
                jnp.int32(0),
                jnp.zeros((NC, G * C), jnp.float32),
                jnp.zeros((NC, G * C, nwords), jnp.uint32),
            ),
        )
    else:

        def body(chunk):
            def live(_):
                return live_compute(chunk)

            def dead(_):
                return (
                    jnp.zeros((G * C,), jnp.float32),
                    jnp.zeros((G * C, nwords), jnp.uint32),
                )

            return jax.lax.cond(jnp.any(chunk["valid"]), live, dead, None)

        if loop == "unroll":
            # Statically unrolled chunk loop: same per-chunk cond graphs,
            # no lax.map while shell (measured ~2.7 ms/batch16 of pure
            # dispatch overhead at 8 steps on v5e).
            NC = fields["valid"].shape[0]
            parts = [
                body({k: v[i] for k, v in fields.items()}) for i in range(NC)
            ]
            angles = jnp.stack([p[0] for p in parts])
            descs = jnp.stack([p[1] for p in parts])
        else:
            angles, descs = jax.lax.map(body, fields)

    def unprep(a):
        a = a.reshape((B // G, nc, G, C) + a.shape[2:])
        return jnp.swapaxes(a, 1, 2).reshape((B, nc * C) + a.shape[4:])

    angles = unprep(angles)[:, :M]
    descs = unprep(descs)[:, :M]

    kps = Keypoints(
        x=kps.x, y=kps.y, response=kps.response, size=kps.size,
        octave=kps.octave, class_id=kps.class_id, angle=angles, valid=kps.valid,
    )
    return Features(
        keypoints=kps, descriptors=jnp.where(kps.valid[..., None], descs, 0)
    )


def describe(
    kps: Keypoints,
    stacks: dict,
    ss_statics: ScaleSpaceStatics,
    d_statics: DescribeStatics,
    backend: str = "xla",
) -> Features:
    """Full description stage.

    backend='xla' (default): chunked one-hot-matmul pipeline below.
    backend='pallas': fused per-keypoint kernel (kernels/describe_pallas) —
    skips invalid slots at runtime, useful when frames carry far fewer
    detections than the capacity.  Semantics match to within transcendental
    rounding; both are parity-gated against the golden model.
    """
    if backend == "pallas":
        from akaze_tpu.kernels.describe_pallas import describe_pallas

        angles, desc = describe_pallas(kps, stacks, ss_statics, d_statics)
        kps = Keypoints(
            x=kps.x, y=kps.y, response=kps.response, size=kps.size,
            octave=kps.octave, class_id=kps.class_id, angle=angles,
            valid=kps.valid,
        )
        return Features(
            keypoints=kps, descriptors=jnp.where(kps.valid[:, None], desc, 0)
        )
    M = kps.capacity
    C = min(d_statics.chunk, M)
    n_chunks = (M + C - 1) // C
    pad = n_chunks * C - M

    def prep(a):
        return jnp.pad(a, (0, pad)).reshape(n_chunks, C)

    fields = {
        "x": prep(kps.x),
        "y": prep(kps.y),
        "class_id": prep(kps.class_id),
        "valid": prep(kps.valid),
    }
    use_pallas_patches = _patch_backend(d_statics.config) == "pallas"
    stacks3 = (
        None
        if use_pallas_patches
        else jnp.stack([stacks["Lt"], stacks["Lx"], stacks["Ly"]])
    )

    def chunk_body(ch):
        patches = (
            _gather_chunk_patches(ch, stacks, ss_statics, d_statics)
            if use_pallas_patches
            else None
        )
        return _describe_chunk(ch, stacks3, ss_statics, d_statics, patches=patches)

    angles, descs = jax.lax.map(chunk_body, fields)
    angles = angles.reshape(-1)[:M]
    descs = descs.reshape(n_chunks * C, -1)[:M]

    kps = Keypoints(
        x=kps.x, y=kps.y, response=kps.response, size=kps.size,
        octave=kps.octave, class_id=kps.class_id, angle=angles, valid=kps.valid,
    )
    descs = jnp.where(kps.valid[:, None], descs, 0)
    return Features(keypoints=kps, descriptors=descs)
