"""Orientation + M-LDB binary descriptor on the stacked scale space.

Reference behavior (SURVEY.md §2 C10/C11): SURF-style dominant orientation
from Lx/Ly samples on a discrete circle; M-LDB = per-cell means of
(Lt, rotated Lx, rotated Ly) over 2x2/3x3/4x4 grids of a rotated patch,
pairwise-compared into 486 bits (61 bytes, LSB-first).

TPU-first design:
  * All sampling patterns (circle offsets, grid offsets, cell assignment,
    comparison pairs, packing weights) are compile-time numpy constants.
  * Per-keypoint work is one batched gather from the (L, H0, W0) stacks
    (nearest-pixel, clipped — the reference's sampling rule), then cell
    means via a static one-hot matmul (MXU-shaped segment mean) and bit
    packing via two small matmuls.  No per-keypoint loops anywhere.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.core.types import Features, Keypoints
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics


def _round_half_up(x: jax.Array) -> jax.Array:
    return jnp.floor(x + 0.5).astype(jnp.int32)


class DescribeStatics:
    """Compile-time sampling patterns shared by orientation and M-LDB."""

    def __init__(self, config: AkazeConfig):
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

        # --- M-LDB grids: sample offsets, cell one-hot, comparison pairs ---
        p = config.descriptor_pattern_size
        self.grids = []
        for step in (p, int(math.ceil(2.0 * p / 3.0)), p // 2):
            offk, offl, cell = [], [], []
            ci = 0
            for i in range(-p, p, step):
                for j in range(-p, p, step):
                    for k in range(i, i + step):
                        for l in range(j, j + step):
                            offk.append(k)
                            offl.append(l)
                            cell.append(ci)
                    ci += 1
            n_cells = ci
            cell = np.array(cell)
            onehot = np.zeros((len(offk), n_cells), np.float32)
            onehot[np.arange(len(offk)), cell] = 1.0
            onehot /= onehot.sum(axis=0, keepdims=True)  # mean, not sum
            pa, pb = np.triu_indices(n_cells, k=1)
            # Reference pair order is a-major (a < b) — triu_indices matches.
            self.grids.append(
                dict(
                    offk=np.array(offk, np.float32),
                    offl=np.array(offl, np.float32),
                    onehot=onehot,
                    pa=pa.astype(np.int32),
                    pb=pb.astype(np.int32),
                )
            )
        self.total_bits = config.descriptor_bits


def _per_level_scale(ss_statics: ScaleSpaceStatics) -> np.ndarray:
    """Reference `scale = max(1, fRound(0.5 * size / ratio))` — static/level."""
    s = np.floor(0.5 * ss_statics.sizes / ss_statics.ratios + 0.5).astype(np.int32)
    return np.maximum(s, 1)


def _gather(stack: jax.Array, lvl: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """stack (L, H0, W0); lvl (M,), iy/ix (M, S) -> (M, S)."""
    return stack[lvl[:, None], iy, ix]


def compute_orientations(
    kps: Keypoints,
    lx_stack: jax.Array,
    ly_stack: jax.Array,
    ss_statics: ScaleSpaceStatics,
    d_statics: DescribeStatics,
) -> jax.Array:
    """Dominant orientation per keypoint (SURVEY.md §2 C10), vectorized."""
    lvl = kps.class_id
    ratios = jnp.asarray(ss_statics.ratios)[lvl]
    scales = jnp.asarray(_per_level_scale(ss_statics))[lvl].astype(jnp.float32)
    widths = jnp.asarray(ss_statics.widths)[lvl]
    heights = jnp.asarray(ss_statics.heights)[lvl]
    xf = kps.x / ratios
    yf = kps.y / ratios

    di = jnp.asarray(d_statics.ori_di)[None, :]  # (1, S)
    dj = jnp.asarray(d_statics.ori_dj)[None, :]
    ix = jnp.clip(_round_half_up(xf[:, None] + di * scales[:, None]), 0, widths[:, None] - 1)
    iy = jnp.clip(_round_half_up(yf[:, None] + dj * scales[:, None]), 0, heights[:, None] - 1)
    w = jnp.asarray(d_statics.ori_w)[None, :]
    rx = w * _gather(lx_stack, lvl, iy, ix)  # (M, S)
    ry = w * _gather(ly_stack, lvl, iy, ix)
    ang = jnp.mod(jnp.arctan2(ry, rx), 2.0 * math.pi)  # (M, S)

    lo = jnp.asarray(d_statics.win_lo)[None, :, None]  # (1, W, 1)
    hi = jnp.asarray(d_statics.win_hi)[None, :, None]
    wrap = jnp.asarray(d_statics.win_wrap)[None, :, None]
    a = ang[:, None, :]  # (M, 1, S)
    inside = jnp.where(
        wrap,
        (a > lo) | (a < hi - 2.0 * math.pi),
        (a > lo) & (a < hi),
    )  # (M, W, S)
    sum_x = jnp.sum(jnp.where(inside, rx[:, None, :], 0.0), axis=-1)  # (M, W)
    sum_y = jnp.sum(jnp.where(inside, ry[:, None, :], 0.0), axis=-1)
    norm = sum_x * sum_x + sum_y * sum_y
    best = jnp.argmax(norm, axis=-1)  # (M,)
    m = jnp.arange(best.shape[0])
    return jnp.mod(jnp.arctan2(sum_y[m, best], sum_x[m, best]), 2.0 * math.pi)


def compute_descriptors(
    kps: Keypoints,
    lt_stack: jax.Array,
    lx_stack: jax.Array,
    ly_stack: jax.Array,
    ss_statics: ScaleSpaceStatics,
    d_statics: DescribeStatics,
) -> jax.Array:
    """486-bit M-LDB per keypoint, packed little-endian into uint32[M, 16]."""
    cfg = d_statics.config
    lvl = kps.class_id
    ratios = jnp.asarray(ss_statics.ratios)[lvl]
    scales = jnp.asarray(_per_level_scale(ss_statics))[lvl].astype(jnp.float32)
    widths = jnp.asarray(ss_statics.widths)[lvl]
    heights = jnp.asarray(ss_statics.heights)[lvl]
    xf = kps.x / ratios
    yf = kps.y / ratios
    co = jnp.cos(kps.angle)
    si = jnp.sin(kps.angle)

    bit_groups = []
    for grid in d_statics.grids:
        offk = jnp.asarray(grid["offk"])[None, :]  # (1, S) x-ish pattern coord
        offl = jnp.asarray(grid["offl"])[None, :]  # (1, S) y-ish pattern coord
        # Rotated sample positions (reference rule, nearest pixel, clipped).
        sy = yf[:, None] + (offl * co[:, None] + offk * si[:, None]) * scales[:, None]
        sx = xf[:, None] + (-offl * si[:, None] + offk * co[:, None]) * scales[:, None]
        iy = jnp.clip(_round_half_up(sy), 0, heights[:, None] - 1)
        ix = jnp.clip(_round_half_up(sx), 0, widths[:, None] - 1)
        ri = _gather(lt_stack, lvl, iy, ix)  # (M, S)
        rx = _gather(lx_stack, lvl, iy, ix)
        ry = _gather(ly_stack, lvl, iy, ix)
        # Gradient channels rotated into the keypoint frame.
        dx = rx * co[:, None] + ry * si[:, None]
        dy = -rx * si[:, None] + ry * co[:, None]
        onehot = jnp.asarray(grid["onehot"])  # (S, C) mean-normalized
        means = jnp.stack(
            [ch @ onehot for ch in (ri, dx, dy)], axis=0
        )  # (3, M, C) channel-major like the reference bit order
        pa = jnp.asarray(grid["pa"])
        pb = jnp.asarray(grid["pb"])
        bits = means[:, :, pa] > means[:, :, pb]  # (3, M, P)
        bit_groups.append(jnp.moveaxis(bits, 0, 1).reshape(bits.shape[1], -1))
    allbits = jnp.concatenate(bit_groups, axis=-1)  # (M, 486)

    # Pack LSB-first into bytes, then little-endian uint32 words.
    nbytes = cfg.descriptor_bytes
    nwords = cfg.descriptor_words
    pad = nbytes * 8 - allbits.shape[-1]
    padded = jnp.pad(allbits.astype(jnp.uint32), ((0, 0), (0, pad)))
    bytes_ = jnp.sum(
        padded.reshape(-1, nbytes, 8) << jnp.arange(8, dtype=jnp.uint32), axis=-1
    )  # (M, nbytes)
    wpad = nwords * 4 - nbytes
    bytes_ = jnp.pad(bytes_, ((0, 0), (0, wpad)))
    words = jnp.sum(
        bytes_.reshape(-1, nwords, 4) << jnp.arange(0, 32, 8, dtype=jnp.uint32),
        axis=-1,
    )
    return words.astype(jnp.uint32)


def describe(
    kps: Keypoints,
    stacks: dict,
    ss_statics: ScaleSpaceStatics,
    d_statics: DescribeStatics,
) -> Features:
    angles = compute_orientations(
        kps, stacks["Lx"], stacks["Ly"], ss_statics, d_statics
    )
    kps = Keypoints(
        x=kps.x, y=kps.y, response=kps.response, size=kps.size,
        octave=kps.octave, class_id=kps.class_id, angle=angles, valid=kps.valid,
    )
    desc = compute_descriptors(
        kps, stacks["Lt"], stacks["Lx"], stacks["Ly"], ss_statics, d_statics
    )
    desc = jnp.where(kps.valid[:, None], desc, 0)
    return Features(keypoints=kps, descriptors=desc)
