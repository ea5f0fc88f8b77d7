"""Fused chunk-batched Pallas describe: patch gather + orientation + M-LDB.

One kernel replaces the round-2 describe pipeline (Pallas patch gather ->
HBM -> XLA chunked one-hot einsums under a lax.map of lax.conds).  Per
64-keypoint program it:

  1. DMAs each keypoint's aligned (3, PHA, PWA) level-stack window HBM ->
     VMEM with NSLOT=4 keypoints in flight (the patch_pallas.py pipeline,
     inlined), recenters with dynamic rolls;
  2. samples the orientation circle and the 441 unique M-LDB offsets with
     exact one-hot MXU matmuls in the lane-major form
     patch3 (3*PH, PW) @ RxT (PW, S) -> A, then a sublane-reduce row-select
     sum_h A[ch,h,s] * RyT[h,s] — zero gathers, zero HBM intermediates;
  3. reduces the SURF window scan, cell means, 486 comparisons and LSB-first
     packing with small MXU contractions (means @ mean_mat, means @ adiffT,
     bits @ wlo/whi f32 pack — 16-bit halves keep f32 sums exact);
  4. writes (angle, int32[16] words) — nothing else touches HBM.

Dead work is skipped at 8-keypoint granularity: keypoints are
response-sorted per frame, and each program runs only ceil(live/8)
sub-group iterations of its fori_loop (scalar-prefetched), where `live`
counts through the LAST valid keypoint (validity may have mid-prefix
holes from sub-pixel rejection; holes are skipped per-keypoint inside
phase A).  Fully dead programs cost one zero-fill of the tiny output
block.

Why this shape: the round-2 per-keypoint kernel (kernels/describe_pallas.py)
lost to the XLA chunk path because its serial CK=8 loop issued tiny
(448, 72) x (72, 256) matmuls with no cross-keypoint ILP; here the 8
keypoints of a sub-group are statically unrolled so Mosaic's scheduler
overlaps one keypoint's VPU one-hot builds with another's MXU contractions,
and the recentered (64, 64) patch shrinks K to one MXU pass.

Reference behavior (sampling/rotation/bit order) is identical to
frontend/describe.py — SURVEY.md §2 C10/C11; parity is gated against the
golden model and the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 64  # keypoints per program
U = 8  # sub-group unroll (dead-work skip granularity)
NSLOT = 16  # patch DMA slots: one sub-group resident + one in flight


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _atan2(y, x):
    """Cephes-style atan2 (Mosaic has no atan2 lowering); f32 err ~1e-7 rad.
    Same polynomial as kernels/describe_pallas.py (parity-gated there)."""
    pi = jnp.float32(math.pi)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    safe_ax = jnp.where(ax > 0, ax, 1.0)
    t = ay / safe_ax
    big = t > 2.414213562373095  # tan(3pi/8)
    mid = (t > 0.4142135623730951) & jnp.logical_not(big)
    base = jnp.where(big, pi / 2, jnp.where(mid, pi / 4, 0.0))
    safe_t = jnp.where(big, jnp.maximum(t, 1.0), t)
    tr = jnp.where(big, -1.0 / safe_t, jnp.where(mid, (t - 1.0) / (t + 1.0), t))
    z = tr * tr
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z \
        - 3.33329491539e-1
    q = base + tr + tr * z * p
    q = jnp.where(ax > 0, q, pi / 2)
    q = jnp.where((ax == 0) & (ay == 0), 0.0, q)
    q = jnp.where(x < 0, pi - q, q)
    return jnp.where(y < 0, -q, q)


@functools.lru_cache(maxsize=8)
def _tables(d_statics):
    """Lane-major static tables (numpy, cached per DescribeStatics)."""
    SO = _round_up(len(d_statics.ori_di), 128)  # orientation samples, padded
    S = _round_up(d_statics.n_samples, 128)  # M-LDB samples, padded
    W = _round_up(len(d_statics.win_lo), 8)  # SURF windows, padded

    def lane_pad(a, n, fill=0.0):
        out = np.full((1, n), fill, np.float32)
        out[0, : len(a)] = a
        return out

    ori_di = lane_pad(d_statics.ori_di, SO)
    ori_dj = lane_pad(d_statics.ori_dj, SO)
    ori_w = lane_pad(d_statics.ori_w, SO)  # pad weight 0 -> pad samples inert
    # Pad windows with lo=+inf so `ang > lo` is never true for them; they
    # produce norm 0 and can never beat a real window under first-max.
    win_lo = np.full((W, 1), 3.0e38, np.float32)
    win_lo[: len(d_statics.win_lo), 0] = d_statics.win_lo
    win_hi = np.zeros((W, 1), np.float32)
    win_hi[: len(d_statics.win_hi), 0] = d_statics.win_hi
    win_wrap = np.zeros((W, 1), np.float32)
    win_wrap[: len(d_statics.win_wrap), 0] = d_statics.win_wrap
    offk = lane_pad(d_statics.all_offk, S)
    offl = lane_pad(d_statics.all_offl, S)

    cells = sum(g["mean_mat"].shape[1] for g in d_statics.grids)
    CP = _round_up(cells, 8)
    mean_mat = np.zeros((S, CP), np.float32)
    mean_mat[: d_statics.n_samples, :cells] = np.concatenate(
        [g["mean_mat"] for g in d_statics.grids], axis=1
    )
    n_bits = d_statics.total_bits
    NB = _round_up(n_bits, 128)
    # bitval[b] = sum_ch cselT[ch, b] * (means @ adiffT)[ch, b]
    #           = means[ch(b), pa(b)] - means[ch(b), pb(b)]   (exact pattern)
    adiffT = np.zeros((CP, NB), np.float32)
    cselT = np.zeros((3, NB), np.float32)
    b = 0
    cell0 = 0
    for grid in d_statics.grids:
        ncells = grid["mean_mat"].shape[1]
        for ch in range(3):
            for a_i, b_i in zip(grid["pa"], grid["pb"]):
                adiffT[cell0 + a_i, b] += 1.0
                adiffT[cell0 + b_i, b] -= 1.0
                cselT[ch, b] = 1.0
                b += 1
        cell0 += ncells
    assert b == n_bits
    # LSB-first packing split into exact-f32 16-bit halves per uint32 word.
    nwords = (n_bits + 31) // 32
    NW = _round_up(nwords, 128)
    wlo = np.zeros((NB, NW), np.float32)
    whi = np.zeros((NB, NW), np.float32)
    for i in range(n_bits):
        w, p = i // 32, i % 32
        if p < 16:
            wlo[i, w] = float(1 << p)
        else:
            whi[i, w] = float(1 << (p - 16))
    return dict(
        ori_di=ori_di, ori_dj=ori_dj, ori_w=ori_w,
        win_lo=win_lo, win_hi=win_hi, win_wrap=win_wrap,
        offk=offk, offl=offl, mean_mat=mean_mat,
        adiffT=adiffT, cselT=cselT, wlo=wlo, whi=whi,
        SO=SO, S=S, W=W, CP=CP, NB=NB, NW=NW, nwords=nwords,
    )

def _fused_kernel(
    # scalar prefetch
    nsub_ref,  # (NP,) i32: live sub-groups per program
    # blocked SMEM per-keypoint DMA scalars
    ints_ref,  # (CB, 8) i32: grp, idx0, idx1, y0a, x0a, dy, dx, valid
    # blocked VMEM copies for batched vector math
    intv_ref,  # (CB, 8) i32 (same content as ints_ref)
    kpfv_ref,  # (CB, 8) f32: xf, yf, scale, xmax, ymax
    # VMEM tables, then 3*G level-stack refs in ANY/HBM (one triple per
    # octave group, each (n_g, B, Hp_g, Wp_g) — or one group for a padded
    # (L, B, H0P, W0P) stack), then outputs and scratch — unpacked below.
    *rest,
    PH, PW, NWORDS, ABLATE, GDIMS,
):
    """Phase-batched body.  Per 8-keypoint sub-group:

      A (per kp): DMA wait -> recenter rolls -> pscr; start kp k+U's DMA.
      B (matmuls per kp, everything else batched (8, SO)): orientation.
      C (matmuls per kp): M-LDB one-hot sampling -> (8, S) channel rows.
      D (batched): rotate channels, means/compare/pack as (24, *) and
        (8, *) contractions, masked block write.

    The first cut of this kernel did ALL post-sampling math per keypoint in
    (1, n)-shaped ops: measured 4.1 ms of non-overlapped VPU time on the
    batch-16 headline (1.2 us/kp) because every op used one sublane of
    eight and chained serially between MXU calls.  Batching phases B/D
    across the sub-group is worth ~8x on that VPU work.
    """
    G = len(GDIMS)
    (ori_di_ref, ori_dj_ref, ori_w_ref, win_lo_ref, win_hi_ref, win_wrap_ref,
     offk_ref, offl_ref, mean_mat_ref, adiffT_ref, cselT_ref, wlo_ref,
     whi_ref) = rest[:13]
    chans_hbm = rest[13 : 13 + 3 * G]  # grouped (lt, lx, ly) per octave
    ang_out, desc_out = rest[13 + 3 * G : 15 + 3 * G]
    slots, pscr, sems = rest[15 + 3 * G :]

    pid = pl.program_id(0)
    ns = nsub_ref[pid]
    ang_out[:] = jnp.zeros_like(ang_out)
    desc_out[:] = jnp.zeros_like(desc_out)

    two_pi = jnp.float32(2.0 * math.pi)

    def make_dma(g, slot, k, c):
        kc = jnp.minimum(k, CB - 1)
        pha, pwa = GDIMS[g]
        y0 = pl.multiple_of(ints_ref[kc, 3], 8)
        x0 = pl.multiple_of(ints_ref[kc, 4], 128)
        return pltpu.make_async_copy(
            chans_hbm[3 * g + c].at[
                ints_ref[kc, 1], ints_ref[kc, 2], pl.ds(y0, pha), pl.ds(x0, pwa)
            ],
            slots.at[slot, c, :pha, :pwa],
            sems.at[slot, c],
        )

    def start(k, slot):
        kc = jnp.minimum(k, CB - 1)
        live = (k < CB) & (ints_ref[kc, 7] > 0)
        for g in range(G):

            @pl.when(live & (ints_ref[kc, 0] == g))
            def _(g=g):
                for c in range(3):
                    make_dma(g, slot, k, c).start()

    # Warm the pipeline: the first sub-group's U fetches in flight.
    for k in range(U):
        start(k, k % NSLOT)

    # Loop-invariant iotas and exact {0,1} segment matrices.  segN @
    # (A * RyT_tiled) turns the per-channel row-select sum_h into one tiny
    # MXU contraction (a naive jnp.sum(axis=0) lowers to ~6 log-steps of
    # full-width VPU adds per channel).
    S = offk_ref.shape[1]
    SO = ori_di_ref.shape[1]
    iota_hS = jax.lax.broadcasted_iota(jnp.int32, (PH, S), 0)
    iota_wS = jax.lax.broadcasted_iota(jnp.int32, (PW, S), 0)
    iota_hO = jax.lax.broadcasted_iota(jnp.int32, (PH, SO), 0)
    iota_wO = jax.lax.broadcasted_iota(jnp.int32, (PW, SO), 0)

    def seg_ones(nch):
        r = jax.lax.broadcasted_iota(jnp.int32, (8, nch * PH), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (8, nch * PH), 1)
        return (r == c // PH).astype(jnp.float32)  # rows >= nch are zero

    seg3 = seg_ones(3)
    seg2 = seg_ones(2)

    def run_sub(sub, carry):
        base_k = sub * U

        # ---- batched per-sub-group scalars (8-row vector reads) ----
        kp8 = kpfv_ref[pl.ds(base_k, U), :]  # (U, 8) f32
        in8 = intv_ref[pl.ds(base_k, U), :]  # (U, 8) i32
        xf8 = kp8[:, 0:1]
        yf8 = kp8[:, 1:2]
        sc8 = kp8[:, 2:3]
        xmax8 = kp8[:, 3:4]
        ymax8 = kp8[:, 4:5]
        y0d8 = in8[:, 3:4] + in8[:, 5:6]
        x0d8 = in8[:, 4:5] + in8[:, 6:7]
        valid8 = in8[:, 7:8] > 0

        def coords8(offx, offy):
            """Batched offsets (U or 1, n) -> clipped patch-local coords
            (U, n).  Global round+clip first (reference semantics), then the
            integer origin shift — matching frontend/describe.clip_local."""
            gx = jnp.floor(xf8 + offx * sc8 + 0.5)
            gy = jnp.floor(yf8 + offy * sc8 + 0.5)
            pxl = jnp.clip(gx, 0.0, xmax8).astype(jnp.int32) - x0d8
            pyl = jnp.clip(gy, 0.0, ymax8).astype(jnp.int32) - y0d8
            return pyl, pxl

        # ---- phase A: wait + recenter into pscr; launch next fetches ----
        for u in range(U):
            k = base_k + u
            slot = jax.lax.rem(k, NSLOT)
            for g in range(G):
                pha, pwa = GDIMS[g]

                @pl.when((ints_ref[k, 7] > 0) & (ints_ref[k, 0] == g))
                def _(k=k, u=u, slot=slot, g=g, pha=pha, pwa=pwa):
                    for c in range(3):
                        make_dma(g, slot, k, c).wait()
                    dy = ints_ref[k, 5]
                    dx = ints_ref[k, 6]
                    for c in range(3):
                        p = slots[slot, c, :pha, :pwa]
                        if pha > PH:
                            p = pltpu.roll(p, jax.lax.rem(pha - dy, pha), 0)
                            p = p[:PH, :]
                        if pwa > PW:
                            p = pltpu.roll(p, jax.lax.rem(pwa - dx, pwa), 1)
                            p = p[:, :PW]
                        # Levels smaller than the patch leave the tail rows/
                        # lanes stale — clipped sample coords never select
                        # them.
                        pscr[u, c, : p.shape[0], : p.shape[1]] = p

            start(k + U, jax.lax.rem(k + U, NSLOT))

        if ABLATE == "dma":
            parts = [jnp.mean(pscr[u, 0]).reshape(1, 1) for u in range(U)]
            ang_out[pl.ds(base_k, U), :] = jnp.concatenate(parts, axis=0)
            return carry

        # ---- phase B: orientation (SURVEY.md §2 C10) ----
        if ABLATE == "noori":
            angle8 = jnp.zeros((U, 1), jnp.float32)
        else:
            oyl8, oxl8 = coords8(ori_di_ref[:], ori_dj_ref[:])  # (U, SO)
            sxp, syp = [], []
            for u in range(U):
                ryT = (iota_hO == oyl8[u : u + 1, :]).astype(jnp.float32)
                rxT = (iota_wO == oxl8[u : u + 1, :]).astype(jnp.float32)
                p2 = jnp.concatenate([pscr[u, 1], pscr[u, 2]], axis=0)
                a = jnp.dot(p2, rxT, preferred_element_type=jnp.float32)
                e = a * jnp.concatenate([ryT, ryT], axis=0)
                s = jnp.dot(seg2, e, preferred_element_type=jnp.float32)
                sxp.append(s[0:1])
                syp.append(s[1:2])
            rxs8 = ori_w_ref[:] * jnp.concatenate(sxp, axis=0)  # (U, SO)
            rys8 = ori_w_ref[:] * jnp.concatenate(syp, axis=0)
            ang = jnp.mod(_atan2(rys8, rxs8), two_pi)  # (U, SO)
            a3 = ang[:, None, :]  # (U, 1, SO)
            lo3 = win_lo_ref[:][None]  # (1, W, 1)
            hi3 = win_hi_ref[:][None]
            wrap3 = win_wrap_ref[:][None] > 0.5
            gt_lo = a3 > lo3  # (U, W, SO)
            in_wrap = gt_lo | (a3 < hi3 - two_pi)
            in_flat = gt_lo & (a3 < hi3)
            # Logical combine, not jnp.where: Mosaic cannot truncate i8
            # select results to i1 for boolean operands.
            inside = (wrap3 & in_wrap) | (jnp.logical_not(wrap3) & in_flat)
            sum_x = jnp.sum(jnp.where(inside, rxs8[:, None, :], 0.0), axis=2)
            sum_y = jnp.sum(jnp.where(inside, rys8[:, None, :], 0.0), axis=2)
            norm = sum_x * sum_x + sum_y * sum_y  # (U, W)
            W = norm.shape[1]
            wiota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            mx = jnp.max(norm, axis=1, keepdims=True)
            best = jnp.min(
                jnp.where(norm == mx, jnp.broadcast_to(wiota, norm.shape), W),
                axis=1,
                keepdims=True,
            )  # (U, 1) first-max window (reference argmax semantics)
            bx = jnp.sum(jnp.where(wiota == best, sum_x, 0.0), axis=1, keepdims=True)
            by = jnp.sum(jnp.where(wiota == best, sum_y, 0.0), axis=1, keepdims=True)
            angle8 = jnp.mod(_atan2(by, bx), two_pi)  # (U, 1)

        if ABLATE == "nodesc":
            ang_out[pl.ds(base_k, U), :] = jnp.where(valid8, angle8, 0.0)
            return carry

        # ---- phases C/D: M-LDB descriptor (SURVEY.md §2 C11) ----
        co8 = jnp.cos(angle8)  # (U, 1)
        si8 = jnp.sin(angle8)
        offk = offk_ref[:]
        offl = offl_ref[:]
        syo8 = offl * co8 + offk * si8  # (U, S)
        sxo8 = -offl * si8 + offk * co8
        pyl8, pxl8 = coords8(sxo8, syo8)  # (U, S)
        s0p, s1p, s2p = [], [], []
        for u in range(U):
            ryT = (iota_hS == pyl8[u : u + 1, :]).astype(jnp.float32)
            rxT = (iota_wS == pxl8[u : u + 1, :]).astype(jnp.float32)
            p3 = jnp.concatenate(
                [pscr[u, 0], pscr[u, 1], pscr[u, 2]], axis=0
            )  # (3*PH, PW)
            a = jnp.dot(p3, rxT, preferred_element_type=jnp.float32)  # (3PH, S)
            e = a * jnp.concatenate([ryT, ryT, ryT], axis=0)
            s = jnp.dot(seg3, e, preferred_element_type=jnp.float32)  # (8, S)
            s0p.append(s[0:1])
            s1p.append(s[1:2])
            s2p.append(s[2:3])
        s0 = jnp.concatenate(s0p, axis=0)  # (U, S)
        s1 = jnp.concatenate(s1p, axis=0)
        s2 = jnp.concatenate(s2p, axis=0)
        dxc = s1 * co8 + s2 * si8  # gradient channels rotated into kp frame
        dyc = -s1 * si8 + s2 * co8
        c24 = jnp.concatenate([s0, dxc, dyc], axis=0)  # (3U, S) channel-major
        means = jnp.dot(
            c24, mean_mat_ref[:], preferred_element_type=jnp.float32
        )  # (3U, CP)
        d2 = jnp.dot(
            means, adiffT_ref[:], preferred_element_type=jnp.float32
        )  # (3U, NB)
        cT = cselT_ref[:]
        bitval = (
            d2[0:U] * cT[0:1] + d2[U : 2 * U] * cT[1:2] + d2[2 * U :] * cT[2:3]
        )  # (U, NB)
        bits = (bitval > 0.0).astype(jnp.float32)
        lo = jnp.dot(bits, wlo_ref[:], preferred_element_type=jnp.float32)
        hi = jnp.dot(bits, whi_ref[:], preferred_element_type=jnp.float32)
        words = lo.astype(jnp.int32) + hi.astype(jnp.int32) * 65536  # (U, NW)
        desc_out[pl.ds(base_k, U), :] = jnp.where(valid8, words[:, :NWORDS], 0)
        ang_out[pl.ds(base_k, U), :] = jnp.where(valid8, angle8, 0.0)
        return carry

    jax.lax.fori_loop(0, ns, run_sub, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ss_statics", "d_statics", "group_l0", "level_major", "interpret",
    ),
)
def _run(
    kx, ky, class_id, valid, *chans,
    ss_statics, d_statics, group_l0, level_major, interpret,
):
    """Host prep + kernel launch.

    chans: 3 arrays per octave group — (lt, lx, ly) with shapes
    (n_g, B, h_g, w_g) (level-major; idx = (level - l0, frame)) or, for a
    single batch-major group, (B, L, H, W) (idx = (frame, level)).
    group_l0: static tuple of each group's first level index (a single
    all-level group is just (0,)).
    """
    from akaze_tpu.frontend.describe import _per_level_scale, _round_half_up

    B, M = kx.shape
    N = B * M
    assert M % CB == 0, f"keypoint capacity {M} must be a multiple of {CB}"
    PH, PW = d_statics.ph, d_statics.pw
    G = len(group_l0)
    L = ss_statics.num_levels

    # Pad each group's planes to tile-aligned (…, Hp, Wp) and derive the
    # per-group aligned-fetch window dims.
    padded = []
    gdims = []
    for g in range(G):
        trip = chans[3 * g : 3 * g + 3]
        h, w = trip[0].shape[-2], trip[0].shape[-1]
        hp, wp = _round_up(h, 8), _round_up(w, 128)
        if (hp, wp) != (h, w):
            padw = [(0, 0)] * (trip[0].ndim - 2) + [(0, hp - h), (0, wp - w)]
            trip = tuple(jnp.pad(a, padw) for a in trip)
        padded.extend(trip)
        gdims.append((min(PH + 8, hp), min(_round_up(PW + 127, 128), wp)))
    gdims = tuple(gdims)
    max_pha = max(p for p, _ in gdims)
    max_pwa = max(p for _, p in gdims)

    # Static per-LEVEL lookup tables for the per-keypoint geometry.
    grp_of = np.zeros(L, np.int32)
    l0_of = np.zeros(L, np.int32)
    hp_of = np.zeros(L, np.int32)
    wp_of = np.zeros(L, np.int32)
    pha_of = np.zeros(L, np.int32)
    pwa_of = np.zeros(L, np.int32)
    bounds = list(group_l0) + [L]
    for g in range(G):
        sl = slice(bounds[g], bounds[g + 1])
        grp_of[sl] = g
        l0_of[sl] = bounds[g]
        hp_of[sl] = _round_up(int(padded[3 * g].shape[-2]), 8)
        wp_of[sl] = _round_up(int(padded[3 * g].shape[-1]), 128)
        pha_of[sl] = gdims[g][0]
        pwa_of[sl] = gdims[g][1]

    # Flat per-keypoint geometry (identical to frontend/describe.py
    # _chunk_geometry + kernels/patch_pallas alignment, per group layout).
    lvl = class_id.reshape(N).astype(jnp.int32)
    ratios = jnp.asarray(ss_statics.ratios)[lvl]
    scales = jnp.asarray(_per_level_scale(ss_statics))[lvl].astype(jnp.float32)
    widths = jnp.asarray(ss_statics.widths)[lvl]
    heights = jnp.asarray(ss_statics.heights)[lvl]
    xf = kx.reshape(N) / ratios
    yf = ky.reshape(N) / ratios
    y0d = jnp.clip(_round_half_up(yf) - PH // 2, 0, jnp.maximum(heights - PH, 0))
    x0d = jnp.clip(_round_half_up(xf) - PW // 2, 0, jnp.maximum(widths - PW, 0))
    y0a = jnp.minimum(
        (y0d // 8) * 8, jnp.asarray(hp_of)[lvl] - jnp.asarray(pha_of)[lvl]
    )
    x0a = jnp.minimum(
        (x0d // 128) * 128, jnp.asarray(wp_of)[lvl] - jnp.asarray(pwa_of)[lvl]
    )
    frame = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M)
    grp = jnp.asarray(grp_of)[lvl]
    lvl_loc = lvl - jnp.asarray(l0_of)[lvl]
    idx0, idx1 = (lvl_loc, frame) if level_major else (frame, lvl_loc)
    v = valid.reshape(N).astype(jnp.int32)
    ints = jnp.stack(
        [grp, idx0, idx1, y0a, x0a, y0d - y0a, x0d - x0a, v], axis=1
    )
    kpf = jnp.stack(
        [
            xf, yf, scales,
            (widths - 1).astype(jnp.float32),
            (heights - 1).astype(jnp.float32),
            jnp.zeros_like(xf), jnp.zeros_like(xf), jnp.zeros_like(xf),
        ],
        axis=1,
    )
    # Live sub-groups per program.  Coverage must extend through the LAST
    # valid keypoint, not sum(valid): detect() invalidates subpixel-rejected
    # winners in place (frontend/detect.py `keep`) without compacting, so
    # validity can have mid-prefix holes.  A sum-based count would strand
    # trailing valid keypoints past ceil(count/U) sub-groups with zero
    # descriptors (still flagged valid) and leak their prefetch-DMA
    # semaphores into later grid programs.
    kp_iota = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    counts = jnp.max(jnp.where(valid, kp_iota + 1, 0), axis=1)  # (B,)
    ppf = M // CB  # programs per frame
    off = jnp.tile(jnp.arange(ppf, dtype=jnp.int32) * CB, B)
    live = jnp.clip(jnp.repeat(counts, ppf) - off, 0, CB)
    nsub = (live + U - 1) // U  # (NP,)

    t = _tables(d_statics)
    tables = (
        t["ori_di"], t["ori_dj"], t["ori_w"],
        t["win_lo"], t["win_hi"], t["win_wrap"],
        t["offk"], t["offl"], t["mean_mat"], t["adiffT"], t["cselT"],
        t["wlo"], t["whi"],
    )
    NWORDS = d_statics.config.descriptor_words

    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // CB,),
        in_specs=[
            # DMA scalars in SMEM; the same per-keypoint data again in VMEM
            # for the batched (8, n) vector phases.
            pl.BlockSpec((CB, 8), lambda i, *_: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            *([vmem_full] * len(tables)),
            *([pl.BlockSpec(memory_space=pl.ANY)] * (3 * G)),
        ],
        out_specs=[
            pl.BlockSpec((CB, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (CB, NWORDS), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 3, max_pha, max_pwa), jnp.float32),
            pltpu.VMEM((U, 3, PH, PW), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOT, 3)),
        ],
    )
    import os

    angles, desc = pl.pallas_call(
        functools.partial(
            _fused_kernel, PH=PH, PW=PW, NWORDS=NWORDS, GDIMS=gdims,
            ABLATE=os.environ.get("AKAZE_FUSED_ABLATE", ""),
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, NWORDS), jnp.int32),
        ],
        interpret=interpret,
    )(
        nsub,
        ints.astype(jnp.int32),
        ints.astype(jnp.int32),
        kpf.astype(jnp.float32),
        *(jnp.asarray(x) for x in tables),
        *padded,
    )
    angles = angles.reshape(B, M)
    desc = jax.lax.bitcast_convert_type(desc, jnp.uint32).reshape(B, M, NWORDS)
    return angles, desc


def describe_fused(kps, stacks, ss_statics, d_statics, interpret: bool = False):
    """Fused describe over batched keypoints.

    kps: Keypoints with (B, M) leaves (single frames: B=1).  stacks: dict
    with either "lvl_oct" (per-octave zero-copy level stacks from the
    with_detect builder: tuple of dicts with Lt/Lx/Ly (n, B, h, w)) or
    Lt/Lx/Ly as one stack — level-major (L, B, H0, W0)
    (stacks["level_major"]), batch-major (B, L, H0, W0), or single-frame
    (L, H0, W0).  Returns (angles (B, M) f32, descriptors (B, M, nwords)
    uint32).
    """
    if "lvl_oct" in stacks:
        from akaze_tpu.kernels.fed_pallas import octave_groups

        groups = octave_groups(ss_statics)
        chans = []
        for d in stacks["lvl_oct"]:
            chans.extend([d["Lt"], d["Lx"], d["Ly"]])
        return _run(
            kps.x, kps.y, kps.class_id, kps.valid, *chans,
            ss_statics=ss_statics, d_statics=d_statics,
            group_l0=tuple(l0 for (l0, _, _, _) in groups),
            level_major=True, interpret=interpret,
        )
    lt, lx, ly = stacks["Lt"], stacks["Lx"], stacks["Ly"]
    level_major = bool(stacks.get("level_major", False)) and lt.ndim == 4
    if lt.ndim == 3:
        lt, lx, ly = lt[:, None], lx[:, None], ly[:, None]
        level_major = True  # (L, 1, H, W)
    return _run(
        kps.x, kps.y, kps.class_id, kps.valid, lt, lx, ly,
        ss_statics=ss_statics, d_statics=d_statics, group_l0=(0,),
        level_major=level_major, interpret=interpret,
    )
