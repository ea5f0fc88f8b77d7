"""Fused Pallas scale-space kernel: one program per (frame, level).

SURVEY.md §3.2 / §7.3 headline kernel: the XLA path streams Lt/g to HBM on
every FED tau sweep (~46 sweeps x 3 arrays per frame); this kernel keeps the
whole level in VMEM and runs the complete per-level chain in one pass:

    seed Lt (prev level, VMEM)
      -> Lsmooth = G_{1.0} * Lt            (separable 5-tap, VMEM)
      -> g = diffusivity(scharr grad Lsmooth, k)
      -> n_tau explicit diffusion sweeps   (all VMEM-resident)
      -> detector chain: sigma_size-scaled Scharr cascade -> Lx, Ly, Ldet

HBM traffic per level drops from O(n_tau) full-image round trips to exactly
one read (seed) + four writes (Lt, Lx, Ly, Ldet) — the GPGPU-KAZE fusion
(PAPERS.md) done the TPU way.  A VGA octave-0 level is 1.2 MB, so the ~6
working arrays fit VMEM comfortably; deeper octaves are smaller.

Numerics are the same f32 shift-and-add formulas as frontend/scale_space
(parity-gated against the golden model like every other stage).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from akaze_tpu.core.config import AkazeConfig, Diffusivity
from akaze_tpu.core.fed import EvolutionSpec
from akaze_tpu.golden.image import gaussian_kernel, scharr_kernels


def _shift_y(x: jax.Array, d: int) -> jax.Array:
    """result[..., y, :] = x[..., clamp(y+d, 0, H-1), :] (edge replicate)
    via a circular roll + boundary select.  Rolls keep every intermediate on
    the aligned (H, W) tile grid — the concat-pad formulation materialized
    (H+2k, W) copies whose odd sublane offsets force relayouts on every
    shifted slice."""
    if d == 0:
        return x
    h = x.shape[-2]
    ax = x.ndim - 2
    out = pltpu.roll(x, (-d) % h, ax)  # roll requires a non-negative shift
    ys = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
    if d > 0:
        return jnp.where(ys >= h - d, x[..., h - 1 : h, :], out)
    return jnp.where(ys < -d, x[..., 0:1, :], out)


def _shift_x(x: jax.Array, d: int) -> jax.Array:
    """result[..., x] = x[..., clamp(x+d, 0, W-1)] (edge replicate)."""
    if d == 0:
        return x
    w = x.shape[-1]
    ax = x.ndim - 1
    out = pltpu.roll(x, (-d) % w, ax)  # roll requires a non-negative shift
    xs = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
    if d > 0:
        return jnp.where(xs >= w - d, x[..., w - 1 : w], out)
    return jnp.where(xs < -d, x[..., 0:1], out)


def _sep_conv(x: jax.Array, ky: np.ndarray, kx: np.ndarray) -> jax.Array:
    """Separable correlation with edge replication on a (H, W) VMEM value
    (same tap order / f32 accumulation as the golden model)."""
    hy = len(ky) // 2
    acc = None
    for t, wgt in enumerate(np.asarray(ky, np.float32)):
        if wgt == 0.0:
            continue
        term = wgt * _shift_y(x, t - hy)
        acc = term if acc is None else acc + term
    hx = len(kx) // 2
    x = acc
    acc = None
    for t, wgt in enumerate(np.asarray(kx, np.float32)):
        if wgt == 0.0:
            continue
        term = wgt * _shift_x(x, t - hx)
        acc = term if acc is None else acc + term
    return acc


def _scharr(x: jax.Array, x_order: int, sigma_size: int) -> jax.Array:
    deriv, smooth = scharr_kernels(sigma_size)
    if x_order == 1:
        return _sep_conv(x, smooth, deriv)
    return _sep_conv(x, deriv, smooth)


def _conductivity(lx, ly, k, kind: Diffusivity):
    grad2 = (lx * lx + ly * ly) / (k * k)
    if kind == Diffusivity.PM_G2:
        return 1.0 / (1.0 + grad2)
    if kind == Diffusivity.PM_G1:
        return jnp.exp(-grad2)
    if kind == Diffusivity.WEICKERT:
        g2_4 = grad2 * grad2
        g2_4 = g2_4 * g2_4
        safe = jnp.where(g2_4 > 0, g2_4, 1.0)
        return jnp.where(grad2 > 0.0, 1.0 - jnp.exp(-3.315 / safe), 1.0)
    raise AssertionError(kind)


def _diffusion_chain(lt, g, taus):
    """All tau sweeps of one level with the conductivity terms hoisted:
    the four (g_c + g_neighbor) sums are invariant across sweeps, so they
    are computed once instead of re-derived every sweep."""
    ge = g + _shift_x(g, 1)
    gw = g + _shift_x(g, -1)
    gs = g + _shift_y(g, 1)
    gn = g + _shift_y(g, -1)
    for tau in taus:
        step = (
            ge * (_shift_x(lt, 1) - lt)
            + gw * (_shift_x(lt, -1) - lt)
            + gs * (_shift_y(lt, 1) - lt)
            + gn * (_shift_y(lt, -1) - lt)
        )
        lt = lt + jnp.float32(0.5 * tau) * step
    return lt


def _detector_chain(lsmooth, sigma_size):
    s = sigma_size
    lx = _scharr(lsmooth, 1, s)
    ly = _scharr(lsmooth, 0, s)
    lxx = _scharr(lx, 1, s)
    lyy = _scharr(ly, 0, s)
    lxy = _scharr(lx, 0, s)
    sf = jnp.float32(s)
    s2 = jnp.float32(s * s)
    ldet = (lxx * s2) * (lyy * s2) - (lxy * s2) * (lxy * s2)
    return lx * sf, ly * sf, ldet


#: Sub-pixel offsets quantize to 1/16000 px halves of one int32 word
#: (round 4): ONE packed field plane instead of two f32 planes halves the
#: field write traffic AND halves the per-keypoint gathers in detect —
#: the 8 separate 16k-row ox/oy gathers were ~1.9 ms of the 13 ms
#: batch-16 device step.  Offsets are bounded (|o| <= 1 by the keep
#: rule), so (o + 1) * 16000 fits 15 bits exactly; quantization error
#: <= 1/32000 px, far below the 0.5 px parity gates.  Rejected fits pack
#: as -1 (the old NaN sentinel).
SUB_SCALE = 16000.0


def pack_sub(ox, oy, keep):
    """(ox, oy, keep) -> int32 packed field (qx * 65536 + qy; -1 = reject)."""
    qx = jnp.round(
        (jnp.clip(jnp.where(keep, ox, 0.0), -1.0, 1.0) + 1.0) * SUB_SCALE
    ).astype(jnp.int32)
    qy = jnp.round(
        (jnp.clip(jnp.where(keep, oy, 0.0), -1.0, 1.0) + 1.0) * SUB_SCALE
    ).astype(jnp.int32)
    return jnp.where(keep, qx * 65536 + qy, -1)


def unpack_sub(packed):
    """int32 packed field values -> (ox, oy, keep)."""
    keep = packed >= 0
    p = jnp.maximum(packed, 0)
    qx = p // 65536
    qy = p - qx * 65536
    inv = jnp.float32(1.0 / SUB_SCALE)
    return (
        qx.astype(jnp.float32) * inv - 1.0,
        qy.astype(jnp.float32) * inv - 1.0,
        keep,
    )


def _score_fields_chain(ldet, border, threshold):
    """In-kernel candidate scores + PACKED sub-pixel offset field for one
    level (f, h, w) — the same construction as _dense_score_fields, computed
    on the VMEM-resident ldet (round 3: the XLA pass over the per-octave
    ldet stacks was ~3-5 ms/batch16 of fusion traffic, and folding it here
    also removes the ldet HBM round trip entirely on the with_detect
    path)."""
    h, w = ldet.shape[-2], ldet.shape[-1]
    n_e, n_w = _shift_x(ldet, 1), _shift_x(ldet, -1)
    n_s, n_n = _shift_y(ldet, 1), _shift_y(ldet, -1)
    n_se, n_nw = _shift_x(n_s, 1), _shift_x(n_n, -1)
    n_ne, n_sw = _shift_x(n_n, 1), _shift_x(n_s, -1)
    nmax = jnp.maximum(n_e, n_w)
    nmax = jnp.maximum(nmax, jnp.maximum(n_s, n_n))
    nmax = jnp.maximum(nmax, jnp.maximum(n_se, n_nw))
    nmax = jnp.maximum(nmax, jnp.maximum(n_ne, n_sw))
    ys = jax.lax.broadcasted_iota(jnp.int32, ldet.shape, ldet.ndim - 2)
    xs = jax.lax.broadcasted_iota(jnp.int32, ldet.shape, ldet.ndim - 1)
    interior = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    cand = interior & (ldet > threshold) & (ldet > nmax)
    score = jnp.where(cand, ldet, jnp.float32(-3.0e38))

    dxv = 0.5 * (n_e - n_w)
    dyv = 0.5 * (n_s - n_n)
    dxx = n_e + n_w - 2.0 * ldet
    dyy = n_s + n_n - 2.0 * ldet
    dxy = 0.25 * (n_se + n_nw - n_ne - n_sw)
    det = dxx * dyy - dxy * dxy
    safe_det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    ox = (-dxv * dyy + dyv * dxy) / safe_det
    oy = (-dyv * dxx + dxv * dxy) / safe_det
    keep = (jnp.abs(det) >= 1e-30) & (jnp.abs(ox) <= 1.0) & (jnp.abs(oy) <= 1.0)
    return score, pack_sub(ox, oy, keep)


def _level_kernel(k_ref, seed_ref, lt_out, lx_out, ly_out, ldet_out,
                  *, taus, sigma_size, diffusivity, first_level):
    """One (frame, level) program: full fused level chain in VMEM.
    k_ref: scalar-prefetch (B,) contrast factors in SMEM."""
    x = seed_ref[0]
    if first_level:
        # Level 0: seed is already G_{sigma0} * img; Lsmooth == Lt, no FED.
        lsmooth = x
    else:
        g1k = gaussian_kernel(1.0)
        lsmooth = _sep_conv(x, g1k, g1k)
        gx = _scharr(lsmooth, 1, 1)
        gy = _scharr(lsmooth, 0, 1)
        g = _conductivity(gx, gy, k_ref[pl.program_id(0)], diffusivity)
        x = _diffusion_chain(x, g, taus)  # static unroll, all VMEM-resident
    lt_out[0] = x
    lx, ly, ldet = _detector_chain(lsmooth, sigma_size)
    lx_out[0] = lx
    ly_out[0] = ly
    ldet_out[0] = ldet


@functools.partial(
    jax.jit, static_argnames=("spec", "diffusivity", "first_level")
)
def fused_level_batched(seed, k, spec: EvolutionSpec, diffusivity: Diffusivity,
                        first_level: bool = False):
    """Run one level for a batch of frames: grid = one program per frame.

    seed (B, H, W): level-0 blurred images (first_level) or the previous
    level's Lt (already half-sized at octave changes); k (B,): per-frame
    contrast factors.  Returns (lt, lx, ly, ldet), each (B, H, W)."""
    b, h, w = seed.shape
    kernel = functools.partial(
        _level_kernel,
        taus=spec.taus,
        sigma_size=spec.sigma_size,
        diffusivity=diffusivity,
        first_level=first_level,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # per-frame contrast factors, SMEM
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 4,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.float32)] * 4,
        # 5 double-buffered (1, H, W) windows + the VMEM-resident working
        # set slightly exceed the 16 MB default scoped-vmem budget at VGA;
        # v5e has headroom above it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(k.reshape(b).astype(jnp.float32), seed)


def fused_level(seed, k, spec, diffusivity, first_level=False):
    """Single-frame convenience wrapper over fused_level_batched."""
    lt, lx, ly, ldet = fused_level_batched(
        seed[None], k.reshape(1), spec, diffusivity, first_level
    )
    return lt[0], lx[0], ly[0], ldet[0]


def _octave_kernel(k_ref, seed_ref, *out_refs, specs, diffusivity, first, f,
                   with_detect, threshold, with_half=False):
    """One program running ALL levels of one octave for `f` frames chained
    in VMEM: each level's Lt seeds the next without an HBM round trip.
    Outputs are level-major (n, f, h, w) blocks of the per-octave
    (n, B, h, w) stacks — the kernel writes the FINAL level-stack layout
    directly, so no XLA pad+stack pass ever touches these arrays (round 3:
    the padded (L, B, H0, W0) stacks cost ~1.9 ms/batch16 of pure
    dynamic-update-slice writes).

    f > 1 amortizes Mosaic's fixed per-op cost across frames — measured:
    an 80x60 level costs almost as much as a 640x480 one per program, so
    deep octaves are op-issue-bound, not element-bound."""
    x = seed_ref[...]  # (f, h, w)
    g1k = gaussian_kernel(1.0)
    base = pl.program_id(0) * f
    if f == 1:
        kf = k_ref[base]  # scalar broadcast
    else:
        # Per-frame contrast factors as an (f, 1, 1) vector, built by
        # selecting SMEM scalars against an iota — Mosaic cannot lower a
        # reshape of a scalar-built 1-D vector to (f, 1, 1).
        fidx = jax.lax.broadcasted_iota(jnp.int32, (f, 1, 1), 0)
        kf = jnp.full((f, 1, 1), k_ref[base], jnp.float32)
        for j in range(1, f):
            kf = jnp.where(fidx == j, k_ref[base + j], kf)
    for li, spec in enumerate(specs):
        if first and li == 0:
            # Level 0: seed is already G_{sigma0} * img; Lsmooth == Lt.
            lsmooth = x
        else:
            lsmooth = _sep_conv(x, g1k, g1k)
            gx = _scharr(lsmooth, 1, 1)
            gy = _scharr(lsmooth, 0, 1)
            g = _conductivity(gx, gy, kf, diffusivity)
            x = _diffusion_chain(x, g, spec.taus)
        out_refs[0][li] = x
        lx, ly, ldet = _detector_chain(lsmooth, spec.sigma_size)
        out_refs[1][li] = lx
        out_refs[2][li] = ly
        if with_detect:
            score, sub = _score_fields_chain(
                ldet, int(spec.border), threshold
            )
            out_refs[3][li] = score
            out_refs[4][li] = sub
        else:
            out_refs[3][li] = ldet
    if with_half:
        # Next octave's seed: 2x2 box mean of the final Lt, computed here
        # on the VMEM-resident plane via exact pair-averaging matmuls
        # (0.5/0.25 are powers of two, so each product is exact f32; only
        # ulp-level association differs from frontend.scale_space.half_size).
        # Emitting the seed from the kernel removes the XLA slice + two
        # relayout copies (~0.5 ms/batch16 in the round-4 trace).
        h, w = x.shape[-2], x.shape[-1]
        h2, w2 = h // 2, w // 2
        ri = jax.lax.broadcasted_iota(jnp.int32, (h2, h), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (h2, h), 1)
        dh = ((ci == 2 * ri) | (ci == 2 * ri + 1)).astype(jnp.float32) * 0.5
        rw = jax.lax.broadcasted_iota(jnp.int32, (w, w2), 0)
        cw = jax.lax.broadcasted_iota(jnp.int32, (w, w2), 1)
        dwT = ((rw == 2 * cw) | (rw == 2 * cw + 1)).astype(jnp.float32) * 0.5
        # precision=HIGHEST: without it a Mosaic lowering below full f32
        # would drift every deeper octave's seed (the same class as the
        # round-4 conv-precision bug, BASELINE.md) — the "exact f32" claim
        # above requires full-precision multiplies (round-4 advisor).
        for j in range(f):
            t = jnp.dot(dh, x[j], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            out_refs[-1][j] = jnp.dot(t, dwT, preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)


@functools.partial(
    jax.jit,
    static_argnames=(
        "specs", "diffusivity", "first", "f", "with_detect", "threshold",
        "with_half",
    ),
)
def fused_octave_batched(
    seed, k, specs, diffusivity: Diffusivity, first: bool, f: int = 1,
    with_detect: bool = False, threshold: float = 0.0,
    with_half: bool = False,
):
    """Run one whole octave for a batch of frames with `f` frames per
    program (f must divide B), levels chained in VMEM.  Returns LEVEL-MAJOR
    (n_levels, B, h, w) stacks written directly by the kernel's out_specs
    (no copy): (lt, lx, ly, ldet), or with_detect=True
    (lt, lx, ly, score, sub) — the detect fields are computed in-kernel
    on the VMEM-resident ldet, which is then never written to HBM at all;
    `sub` is the PACKED int32 sub-pixel field (see pack_sub).
    with_half=True appends the NEXT octave's seed (b, h//2, w//2) — the
    2x2 box mean of the final Lt, computed in-kernel."""
    b, h, w = seed.shape
    assert b % f == 0
    n = len(specs)
    n_out = 5 if with_detect else 4
    kernel = functools.partial(
        _octave_kernel, specs=specs, diffusivity=diffusivity, first=first,
        f=f, with_detect=with_detect, threshold=float(threshold),
        with_half=with_half,
    )
    out_specs = [
        pl.BlockSpec(
            (n, f, h, w), lambda i, *_: (0, i, 0, 0), memory_space=pltpu.VMEM
        )
    ] * n_out
    out_shape = [jax.ShapeDtypeStruct((n, b, h, w), jnp.float32)] * n_out
    if with_detect:
        out_shape[4] = jax.ShapeDtypeStruct((n, b, h, w), jnp.int32)
    if with_half:
        h2, w2 = h // 2, w // 2
        out_specs.append(
            pl.BlockSpec(
                (f, h2, w2), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((b, h2, w2), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // f,),
        in_specs=[
            pl.BlockSpec((f, h, w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(k.reshape(b).astype(jnp.float32), seed)


def _base_kernel(img_ref, seed_out, modg_out, *, sigma0):
    """Base stage for one frame, fully in VMEM: seed = G_{sigma0} * img and
    modg = |grad(G_{1.0} * img)| (Scharr) — the two full-resolution products
    every octave chain starts from (SURVEY.md §3.1: `gaussian_blur(img,
    sigma0)` + the contrast-factor gradient).  Keeping them in one program
    reads the frame from HBM once instead of running ~8 separate XLA conv
    passes over it (measured ~1.5 ms/batch16 of base-resolution fusions)."""
    x = img_ref[...]
    k0 = gaussian_kernel(sigma0)
    seed_out[...] = _sep_conv(x, k0, k0)
    k1 = gaussian_kernel(1.0)
    sm = _sep_conv(x, k1, k1)
    gx = _scharr(sm, 1, 1)
    gy = _scharr(sm, 0, 1)
    modg_out[...] = jnp.sqrt(gx * gx + gy * gy)


@functools.partial(jax.jit, static_argnames=("sigma0",))
def base_stage_batched(imgs: jax.Array, sigma0: float):
    """(B, H, W) frames -> (seed, modg), each (B, H, W) f32, one program per
    frame.  The contrast-factor histogram over `modg` stays in XLA
    (frontend.scale_space.contrast_factor_from_modg): it needs two
    data-dependent global reductions, which are cheap there."""
    b, h, w = imgs.shape
    kernel = functools.partial(_base_kernel, sigma0=sigma0)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(imgs.astype(jnp.float32))


# Octaves below this index run the fused Mosaic kernel (VMEM-resident FED
# chain — the element-bound regime where it wins); octaves at/above it run
# the portable XLA path on native-resolution batched arrays.  Measured
# round 2 on the v5e chip (headline fps at splits 0/1/2/3/4 =
# 148/175/191/191/176): octaves 0-1 are element-bound (Mosaic wins),
# octaves 2-3 are per-op-ISSUE-bound in Mosaic (an 80x60 level costs
# nearly as much as a 640x480 one per program) while XLA batches the
# (B, h, w) levels natively and fuses the stencil chains.
# RE-MEASURED at the round-2 close (22.4 ms operating point, after the
# dense-field/top-k/matcher wins): split 3 now beats split 2 by ~0.7 ms
# (21.7 vs 22.4 ms/batch16; split 1 loses at 26.3) — the XLA octave-2 path
# lost its fusion partners as surrounding stages moved into kernels.
# Golden-parity spot check at split 3 matches split 2; the round-2 "3.9-4.4
# bit" reading was mostly a position-only pairing artifact — with level-aware
# pairing the default split measures Hamming mean ~1.0 on VGA, and the
# all-XLA path (split 0) measures 22.3: the Mosaic octaves are the FAITHFUL
# ones (BASELINE.md round-3 attribution table; tools/parity_spot.py).
def _pallas_octaves(config) -> int:
    """Mosaic/XLA octave split.  Source of truth: config.pallas_octaves
    (round 3: folded from the env var so identical configs give identical
    graphs); AKAZE_PALLAS_OCTAVES stays as a trace-time A/B override."""
    from akaze_tpu.core.config import _env_override

    return _env_override(
        "AKAZE_PALLAS_OCTAVES", config.pallas_octaves, cast=int
    )

_NEG = -3.0e38  # candidate-score sentinel (same as frontend/detect)


def _dense_score_fields(ldet, border, threshold):
    """XLA dense candidate scores + PACKED sub-pixel offset field at native
    (..., h, w) resolution — same construction as the in-kernel
    _score_fields_chain (strict 3x3 max + threshold + static interior
    bounds; 2-var quadratic fit with rejected fits packed as -1; see
    pack_sub).  Candidates are
    strictly interior (border >= 1), so edge-replicate vs padded-stack
    shift semantics can never differ on a selected site.

    border: scalar for one level, or an (n,) array for a level-major
    (n, B, h, w) octave stack (per-level interior bounds)."""
    h, w = ldet.shape[-2], ldet.shape[-1]
    pe = jnp.pad(ldet, [(0, 0)] * (ldet.ndim - 2) + [(1, 1), (1, 1)], mode="edge")

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

    b = np.asarray(border).reshape(-1, 1, 1, 1) if np.ndim(border) else border
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    # Scalar border: (h, w) mask.  Per-level border: (n, 1, h, w) mask that
    # broadcasts against a level-major (n, B, h, w) stack.
    interior = jnp.asarray(
        (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    )
    cand = interior & (ldet > threshold) & (ldet > nmax)
    score = jnp.where(cand, ldet, jnp.float32(_NEG))

    dxv = 0.5 * (n_e - n_w)
    dyv = 0.5 * (n_s - n_n)
    dxx = n_e + n_w - 2.0 * ldet
    dyy = n_s + n_n - 2.0 * ldet
    dxy = 0.25 * (n_se + n_nw - n_ne - n_sw)
    det = dxx * dyy - dxy * dxy
    safe_det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    ox = (-dxv * dyy + dyv * dxy) / safe_det
    oy = (-dyv * dxx + dxv * dxy) / safe_det
    keep = (jnp.abs(det) >= 1e-30) & (jnp.abs(ox) <= 1.0) & (jnp.abs(oy) <= 1.0)
    return score, pack_sub(ox, oy, keep)


def _xla_octave(seed, k, ospecs, config, first):
    """XLA level chain for one octave on (B, h, w) frames; output contract
    matches fused_octave_batched: (lt, lx, ly, ldet), each (n, B, h, w)."""
    from akaze_tpu.frontend.scale_space import (
        conductivity, detector_response_level, fed_cycle, gaussian_blur, scharr,
    )

    kb = k.reshape(-1, 1, 1)
    x = seed
    lts, lxs, lys, ldets = [], [], [], []
    for li, spec in enumerate(ospecs):
        if first and li == 0:
            lsmooth = x
        else:
            lsmooth = gaussian_blur(x, 1.0)
            gx = scharr(lsmooth, 1, 0, 1)
            gy = scharr(lsmooth, 0, 1, 1)
            g = conductivity(gx, gy, kb, config.diffusivity)
            x = fed_cycle(x, g, spec.taus)
        lx, ly, ldet = detector_response_level(lsmooth, spec)
        lts.append(x)
        lxs.append(lx)
        lys.append(ly)
        ldets.append(ldet)
    return (
        jnp.stack(lts), jnp.stack(lxs), jnp.stack(lys), jnp.stack(ldets)
    )


def build_scale_space_pallas_batched(
    imgs: jax.Array, statics, with_detect: bool = False
) -> dict:
    """Batched drop-in for frontend.scale_space.build_scale_space on
    (B, H, W) frames; same stacked (B, L, H0, W0) output contract.

    The batch rides the pallas grid natively (one program per frame) rather
    than jax.vmap — this environment's remote Mosaic compiler rejects the
    vmap-generated variant at B >= 8.  Levels are grouped per OCTAVE into
    one kernel each, and only the first `config.pallas_octaves` octaves use the
    Mosaic kernel (deep octaves are issue-bound there — see the constant).

    with_detect=True additionally returns the fused detect products
    ("score" + packed "sub" stacks — in-kernel for Mosaic octaves, XLA
    `_dense_score_fields` at native resolution for deep octaves), replacing
    the round-2 separate per-(frame, level) detect pass and its
    padded-stack HBM round trip."""
    from akaze_tpu.frontend.scale_space import (
        compute_contrast_factor, contrast_factor_from_modg, gaussian_blur,
        half_size, stack_levels,
    )

    config = statics.config
    specs = statics.specs
    pallas_octaves = _pallas_octaves(config)
    if pallas_octaves > 0:
        # Fused base stage: one Mosaic program per frame produces the seed
        # and the contrast-gradient plane in a single HBM pass.
        seed, modg = base_stage_batched(
            imgs.astype(jnp.float32), float(config.base_scale_offset)
        )
        k = jax.vmap(lambda m: contrast_factor_from_modg(m, config))(modg)
    else:
        k = jax.vmap(lambda im: compute_contrast_factor(im, config))(imgs)  # (B,)
        seed = gaussian_blur(imgs.astype(jnp.float32), config.base_scale_offset)
    octaves: list[tuple] = []
    for spec in specs:
        if not octaves or spec.octave != octaves[-1][0]:
            octaves.append((spec.octave, []))
        octaves[-1][1].append(spec)
    oct_levels = []  # per octave: (lt, lx, ly, ldet), each (n, B, h, w)
    oct_fields = []  # per octave: (score f32, sub i32), each (n, B, h, w)
    next_seed = None  # in-kernel half-size output of the previous octave
    for oi, (_, ospecs) in enumerate(octaves):
        if oi > 0:
            seed = (
                next_seed if next_seed is not None
                else half_size(oct_levels[-1][0][-1])
            )
            k = k * config.contrast_octave_decay
        if oi < pallas_octaves:
            # Deep octaves are per-op-issue-bound in Mosaic (an 80x60 level
            # costs nearly as much as 640x480 per program); batching a few
            # frames per program amortizes the issue cost.  f=16 explodes
            # Mosaic compile time (round-2 negative, >10 min on (16, 60,
            # 80) bodies); small f is the round-3 middle ground, applied
            # only from octave 2 down.
            from akaze_tpu.core.config import _env_override

            deep_f = _env_override(
                "AKAZE_DEEP_F", config.deep_octave_frames, cast=int
            )
            # Clamp: deep_f <= 0 (possible via the int-cast env override)
            # would either divide by zero or walk the loop below to a
            # negative frames-per-program.
            f = max(1, deep_f) if oi >= 2 else 1
            while seed.shape[0] % f:
                f -= 1
            with_half = oi + 1 < len(octaves)
            outs = fused_octave_batched(
                seed, k, tuple(ospecs), config.diffusivity, first=(oi == 0),
                f=f, with_detect=with_detect,
                threshold=float(config.detector_threshold),
                with_half=with_half,
            )
            next_seed = outs[-1] if with_half else None
            if with_half:
                outs = outs[:-1]
            oct_levels.append(outs[:3] + (None,) if with_detect else outs)
            if with_detect:
                oct_fields.append(outs[3:])
        else:
            next_seed = None  # XLA octaves emit no half-size output
            outs = _xla_octave(seed, k, ospecs, config, first=(oi == 0))
            oct_levels.append(outs)
            if with_detect:
                borders = np.asarray(
                    [spec.border for spec in ospecs], np.int32
                )
                oct_fields.append(
                    _dense_score_fields(
                        outs[3], borders, float(config.detector_threshold)
                    )
                )
    # Level stacks stay PER-OCTAVE at native resolution, level-major
    # (n, B, h, w), written directly by the octave kernels' out_specs —
    # no padded (L, B, H0, W0) stacks anywhere (round 3: those cost
    # ~0.4 ms/batch16 of pure HBM writes EACH; ~3.2 ms total in the
    # round-3 trace).
    out = {
        "lvl_oct": tuple(
            {"Lt": o[0], "Lx": o[1], "Ly": o[2]} for o in oct_levels
        ),
        "level_major": True,
    }
    if with_detect:
        out["oct"] = tuple(
            {"score": f0, "sub": f1} for (f0, f1) in oct_fields
        )
    else:
        # Compat contract for the parity tests: padded level-major /
        # batch-major stacks reconstructed from the per-octave arrays.
        out["Lt"] = stack_levels(
            [o[0][i] for o in oct_levels for i in range(o[0].shape[0])],
            specs, level_major=True,
        )
        out["Lx"] = stack_levels(
            [o[1][i] for o in oct_levels for i in range(o[1].shape[0])],
            specs, level_major=True,
        )
        out["Ly"] = stack_levels(
            [o[2][i] for o in oct_levels for i in range(o[2].shape[0])],
            specs, level_major=True,
        )
        out["Ldet"] = stack_levels(
            [o[3][i] for o in oct_levels for i in range(o[3].shape[0])],
            specs,
        )
    return out


def octave_groups(statics) -> tuple:
    """Static per-octave level grouping: tuple of (l0, n, h, w) — the first
    level index, level count and native resolution of each octave."""
    groups = []
    lvl = 0
    L = statics.num_levels
    while lvl < L:
        h, w = int(statics.heights[lvl]), int(statics.widths[lvl])
        n = 1
        while lvl + n < L and int(statics.heights[lvl + n]) == h:
            n += 1
        groups.append((lvl, n, h, w))
        lvl += n
    return tuple(groups)


def build_scale_space_pallas(img: jax.Array, statics, with_detect: bool = False) -> dict:
    """Single-frame wrapper over the batched builder.  Slicing the frame
    axis off both stack flavors yields identical (L, H0, W0) arrays, so the
    level_major flag is moot (and dropped) for single frames."""
    out = build_scale_space_pallas_batched(img[None], statics, with_detect)
    lm = out.pop("level_major", False)
    res = {}
    for k, v in out.items():
        if k in ("Lt", "Lx", "Ly"):
            res[k] = v[:, 0] if lm else v[0]
        elif k == "oct":
            # Level-major (n, B, h, w): drop the frame axis (axis 1).
            res[k] = jax.tree.map(lambda a: a[:, 0], v)
        elif k == "lvl_oct":
            # Keep the frame axis (B=1): the describe kernel indexes
            # [level, frame] uniformly.
            res[k] = v
            res["level_major"] = True
        else:
            res[k] = v[0]
    return res
