"""Fused Pallas TPU kernel: orientation + M-LDB descriptor per keypoint.

Replaces the XLA describe path's patch-slice + chunked matmul pipeline
(frontend/describe.py) with one kernel that, per keypoint:

  1. DMAs the (3, PH, PW) level-stack patch HBM -> VMEM (double-buffered,
     overlapped with the previous keypoint's compute);
  2. samples the orientation circle and the 441 unique M-LDB offsets with
     exact one-hot matmuls on the MXU (zero gathers);
  3. reduces the SURF window scan, cell means, 486 pairwise comparisons and
     LSB-first bit packing entirely in VMEM registers;
  4. writes (angle, uint32[16] descriptor) — nothing else touches HBM.

Keypoints are response-sorted, so slot validity is monotonic: programs whose
keypoints are all invalid skip the DMA and compute under `pl.when` — the
kernel does work proportional to the number of REAL detections even though
every shape is static (the TPU answer to the reference's dynamic Vec).

Semantics mirror frontend/describe.py exactly (same rounding, clipping,
channel rotation, bit order); parity is tested against the golden model and
against the XLA path bit-for-bit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _build_bit_matrices(d_statics):
    """Static matrices turning cell means into packed descriptor words.

    Returns (adiff (486, cells_total), csel (486, 3), wpack (486, 16) i32):
    bit b is set iff sum_c (adiff @ means)[b, c] * csel[b, c] > 0, and the
    packed words are sum_b bit_b * wpack[b] (distinct powers of two, exact
    in int32 wrap arithmetic).
    """
    n_bits = d_statics.total_bits
    cells_total = sum(g["mean_mat"].shape[1] for g in d_statics.grids)
    adiff = np.zeros((n_bits, cells_total), np.float32)
    csel = np.zeros((n_bits, 3), np.float32)
    b = 0
    cell0 = 0
    for grid in d_statics.grids:
        ncells = grid["mean_mat"].shape[1]
        pa, pb = grid["pa"], grid["pb"]
        for ch in range(3):
            for a_i, b_i in zip(pa, pb):
                adiff[b, cell0 + a_i] = 1.0
                adiff[b, cell0 + b_i] = -1.0
                csel[b, ch] = 1.0
                b += 1
        cell0 += ncells
    assert b == n_bits
    nwords = (n_bits + 31) // 32
    wpack = np.zeros((n_bits, nwords), np.uint32)
    for i in range(n_bits):
        wpack[i, i // 32] = np.uint32(1) << np.uint32(i % 32)
    return adiff, csel, wpack.view(np.int32)


def _atan2(y, x):
    """Cephes-style atan2 (Mosaic has no atan2 lowering); f32 err ~1e-7 rad."""
    pi = jnp.float32(math.pi)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    safe_ax = jnp.where(ax > 0, ax, 1.0)
    t = ay / safe_ax
    # atan on [0, inf): two-stage range reduction (Cephes atanf).
    big = t > 2.414213562373095  # tan(3pi/8)
    mid = (t > 0.4142135623730951) & jnp.logical_not(big)
    base = jnp.where(big, pi / 2, jnp.where(mid, pi / 4, 0.0))
    safe_t = jnp.where(big, jnp.maximum(t, 1.0), t)
    tr = jnp.where(
        big, -1.0 / safe_t, jnp.where(mid, (t - 1.0) / (t + 1.0), t)
    )
    z = tr * tr
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z \
        - 3.33329491539e-1
    q = base + tr + tr * z * p
    q = jnp.where(ax > 0, q, pi / 2)
    q = jnp.where((ax == 0) & (ay == 0), 0.0, q)
    q = jnp.where(x < 0, pi - q, q)
    return jnp.where(y < 0, -q, q)


def _describe_kernel(
    # scalar prefetch (SMEM)
    lvl_ref, y0_ref, x0_ref, valid_ref,
    # tensor inputs
    kpf_ref,  # (CK, 8) f32: cxl, cyl, scale, xmax, ymax
    ori_di_ref, ori_dj_ref, ori_w_ref,  # (SO, 1) f32
    win_lo_ref, win_hi_ref, win_wrap_ref,  # (W, 1)
    offk_ref, offl_ref,  # (S, 1) f32
    mean_mat_ref,  # (S, cells) f32
    adiff_ref, csel_ref, wpack_ref,  # (486, cells) f32 / (486, 3) f32 / (486, NW) i32
    stacks_ref,  # (3, L, H0, W0) f32 in ANY/HBM
    # outputs
    angle_out,  # (CK, 1) f32
    desc_out,  # (CK, NW) i32
    # scratch
    patch,  # (2, 3, PH, PW) f32 VMEM
    sems,  # DMA sems (2, 3)
    *,
    CK, PH, PW,
):
    ori_di, ori_dj, ori_w = ori_di_ref[:], ori_dj_ref[:], ori_w_ref[:]
    win_lo, win_hi, win_wrap = win_lo_ref[:], win_hi_ref[:], win_wrap_ref[:]
    offk, offl = offk_ref[:], offl_ref[:]
    mean_mat, adiff, csel, wpack = (
        mean_mat_ref[:], adiff_ref[:], csel_ref[:], wpack_ref[:]
    )
    S = offk.shape[0]
    SO = ori_di.shape[0]
    pid = pl.program_id(0)
    base = pid * CK

    def make_dma(slot, k, ch):
        g = base + k
        # Origins are tile-aligned by construction in _run; Mosaic needs the
        # divisibility stated explicitly to allow the HBM slice.
        y0 = pl.multiple_of(y0_ref[g], 8)
        x0 = pl.multiple_of(x0_ref[g], 128)
        return pltpu.make_async_copy(
            stacks_ref.at[ch, lvl_ref[g], pl.ds(y0, PH), pl.ds(x0, PW)],
            patch.at[slot, ch],
            sems.at[slot, ch],
        )

    def start_dma(slot, k):
        for ch in range(3):
            make_dma(slot, k, ch).start()

    def wait_dma(slot, k):
        for ch in range(3):
            make_dma(slot, k, ch).wait()

    @pl.when(valid_ref[base] > 0)
    def _():
        start_dma(0, 0)

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, PH), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, PW), 1)

    def sample(ch_patch, py, px):
        """One-hot matmul sampling: patch (PH, PW), py/px (n, 1) ->
        samples (n, 1) f32, bit-exact (single nonzero per contraction)."""
        ry = (py == iota_h).astype(jnp.float32)  # (n, PH)
        rx = (px == iota_w).astype(jnp.float32)  # (n, PW)
        a = jnp.dot(ry, ch_patch, preferred_element_type=jnp.float32)  # (n, PW)
        return jnp.sum(a * rx, axis=1, keepdims=True)  # (n, 1)

    num_kps = valid_ref.shape[0]

    def loop_body(k, carry):
        slot = jax.lax.rem(k, 2)
        nxt = jnp.minimum(base + k + 1, num_kps - 1)  # clamp: guarded below

        @pl.when((k + 1 < CK) & (valid_ref[nxt] > 0))
        def _():
            start_dma(jax.lax.rem(k + 1, 2), k + 1)

        @pl.when(valid_ref[base + k] > 0)
        def _():
            wait_dma(slot, k)
            cxl = kpf_ref[k, 0]
            cyl = kpf_ref[k, 1]
            scale = kpf_ref[k, 2]
            xmax = kpf_ref[k, 3]
            ymax = kpf_ref[k, 4]

            def coords(offx, offy):
                """Pattern offsets (n, 1) -> clipped patch-local int coords."""
                gx = jnp.floor(cxl + offx * scale + 0.5)
                gy = jnp.floor(cyl + offy * scale + 0.5)
                px = jnp.clip(gx, 0.0, xmax).astype(jnp.int32)
                py = jnp.clip(gy, 0.0, ymax).astype(jnp.int32)
                return py, px

            # ---- orientation (SURVEY.md §2 C10) ----
            oy, ox = coords(ori_di, ori_dj)
            rx_s = ori_w * sample(patch[slot, 1], oy, ox)  # (SO, 1) weighted Lx
            ry_s = ori_w * sample(patch[slot, 2], oy, ox)
            ang = jnp.mod(_atan2(ry_s, rx_s), 2.0 * math.pi)  # (SO, 1)
            a_t = ang.reshape(1, SO)
            gt_lo = a_t > win_lo
            in_wrap = gt_lo | (a_t < win_hi - 2.0 * math.pi)
            in_flat = gt_lo & (a_t < win_hi)
            not_wrap = jnp.logical_not(win_wrap)
            inside = (win_wrap & in_wrap) | (not_wrap & in_flat)  # (W, SO)
            sum_x = jnp.sum(
                jnp.where(inside, rx_s.reshape(1, SO), 0.0), axis=1, keepdims=True
            )  # (W, 1)
            sum_y = jnp.sum(
                jnp.where(inside, ry_s.reshape(1, SO), 0.0), axis=1, keepdims=True
            )
            norm = sum_x * sum_x + sum_y * sum_y  # (W, 1)
            # First-max window (reference argmax semantics) without 1-D argmax.
            nwin = norm.shape[0]
            win_iota = jax.lax.broadcasted_iota(jnp.int32, (nwin, 1), 0)
            mmax = jnp.max(norm)
            best = jnp.min(jnp.where(norm == mmax, win_iota, nwin))
            bx = jnp.sum(jnp.where(win_iota == best, sum_x, 0.0))
            by = jnp.sum(jnp.where(win_iota == best, sum_y, 0.0))
            angle = jnp.mod(_atan2(by, bx), 2.0 * math.pi)
            angle_out[pl.ds(k, 1), :] = angle.reshape(1, 1)

            # ---- M-LDB descriptor (SURVEY.md §2 C11) ----
            co = jnp.cos(angle)
            si = jnp.sin(angle)
            sy_off = offl * co + offk * si
            sx_off = -offl * si + offk * co
            py, px = coords(sx_off, sy_off)
            ri = sample(patch[slot, 0], py, px)  # (S, 1)
            gx_s = sample(patch[slot, 1], py, px)
            gy_s = sample(patch[slot, 2], py, px)
            dx = gx_s * co + gy_s * si
            dy = -gx_s * si + gy_s * co
            chans = jnp.concatenate([ri, dx, dy], axis=1)  # (S, 3)
            means = jnp.dot(
                mean_mat.T, chans, preferred_element_type=jnp.float32
            )  # (cells, 3)
            d = jnp.dot(adiff, means, preferred_element_type=jnp.float32)  # (486, 3)
            bitval = jnp.sum(d * csel, axis=1, keepdims=True)  # (486, 1)
            bits = (bitval > 0.0).astype(jnp.int32)
            words = jnp.sum(bits * wpack, axis=0)  # (NW,) int32 exact bit-or
            desc_out[pl.ds(k, 1), :] = words.reshape(1, -1)

        @pl.when(valid_ref[base + k] == 0)
        def _():
            angle_out[pl.ds(k, 1), :] = jnp.zeros((1, 1), jnp.float32)
            desc_out[pl.ds(k, 1), :] = jnp.zeros((1, desc_out.shape[1]), jnp.int32)

        return carry

    jax.lax.fori_loop(0, CK, loop_body, 0)


@functools.partial(
    jax.jit, static_argnames=("ss_statics", "d_statics", "interpret")
)
def _run(kx, ky, class_id, valid, stacks3, *, ss_statics, d_statics, interpret):
    M = kx.shape[0]
    CK = 8  # keypoints per program (fori_loop body; 2 DMA slots overlap)
    assert M % CK == 0, f"keypoint capacity {M} must be a multiple of {CK}"
    PH, PW = d_statics.pallas_ph, d_statics.pallas_pw
    H0P, W0P = d_statics.pallas_h0, d_statics.pallas_w0
    m = d_statics.reach + 1

    from akaze_tpu.frontend.describe import _per_level_scale, _round_half_up, _round_up

    # Pad the stack so the aligned clamp bounds (H0P-PH, W0P-PW) stay
    # tile-aligned and full-width DMAs are legal on small images.
    h0, w0 = ss_statics.h0, ss_statics.w0
    stacks3 = jnp.pad(stacks3, ((0, 0), (0, 0), (0, H0P - h0), (0, W0P - w0)))

    lvl = class_id
    ratios = jnp.asarray(ss_statics.ratios)[lvl]
    scales = jnp.asarray(_per_level_scale(ss_statics))[lvl].astype(jnp.float32)
    widths = jnp.asarray(ss_statics.widths)[lvl]
    heights = jnp.asarray(ss_statics.heights)[lvl]
    xf = kx / ratios
    yf = ky / ratios
    # Tile-aligned patch origins covering [c - m, c + m] (see DescribeStatics
    # pallas patch-geometry derivation).
    cy = _round_half_up(yf)
    cx = _round_half_up(xf)
    y0 = jnp.clip((cy // 8) * 8 - _round_up(m, 8), 0, H0P - PH)
    bx = (cx // 128) * 128
    if m <= 64:
        x0 = jnp.where(cx - bx < m, bx - 128, bx)
    else:
        x0 = bx - _round_up(m, 128)
    x0 = jnp.clip(x0, 0, W0P - PW)
    kpf = jnp.stack(
        [
            xf - x0.astype(jnp.float32),
            yf - y0.astype(jnp.float32),
            scales,
            (widths - 1 - x0).astype(jnp.float32),
            (heights - 1 - y0).astype(jnp.float32),
            jnp.zeros_like(xf), jnp.zeros_like(xf), jnp.zeros_like(xf),
        ],
        axis=1,
    )  # (M, 8)

    adiff, csel, wpack = _build_bit_matrices(d_statics)
    statics = (
        jnp.asarray(d_statics.ori_di)[:, None],
        jnp.asarray(d_statics.ori_dj)[:, None],
        jnp.asarray(d_statics.ori_w)[:, None],
        jnp.asarray(d_statics.win_lo)[:, None],
        jnp.asarray(d_statics.win_hi)[:, None],
        jnp.asarray(d_statics.win_wrap)[:, None],
        jnp.asarray(d_statics.all_offk)[:, None],
        jnp.asarray(d_statics.all_offl)[:, None],
        jnp.concatenate([jnp.asarray(g["mean_mat"]) for g in d_statics.grids], axis=1),
        jnp.asarray(adiff),
        jnp.asarray(csel),
        jnp.asarray(wpack),
    )
    nwords = d_statics.config.descriptor_words

    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(M // CK,),
        in_specs=[
            # Per-keypoint scalars live in SMEM: read one element at a time
            # at a traced index inside the fori_loop.
            pl.BlockSpec((CK, 8), lambda i, *_: (i, 0), memory_space=pltpu.SMEM),
            *([vmem_full] * len(statics)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((CK, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CK, nwords), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, PH, PW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    angles, desc = pl.pallas_call(
        functools.partial(_describe_kernel, CK=CK, PH=PH, PW=PW),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, nwords), jnp.int32),
        ],
        interpret=interpret,
    )(
        lvl.astype(jnp.int32),
        y0.astype(jnp.int32),
        x0.astype(jnp.int32),
        valid.astype(jnp.int32),
        kpf,
        *statics,
        stacks3,
    )
    return angles[:, 0], jax.lax.bitcast_convert_type(desc, jnp.uint32)


def describe_pallas(kps, stacks, ss_statics, d_statics, interpret: bool = False):
    """Pallas describe path: returns (angles (M,), descriptors u32 (M, W)).

    Requires the level stack to be at least patch-sized; callers fall back
    to the XLA path otherwise (frontend/describe.describe dispatch).
    """
    stacks3 = jnp.stack([stacks["Lt"], stacks["Lx"], stacks["Ly"]])
    return _run(
        kps.x, kps.y, kps.class_id, kps.valid, stacks3,
        ss_statics=ss_statics, d_statics=d_statics, interpret=interpret,
    )
