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


def _octave_kernel(k_ref, seed_ref, *out_refs, specs, diffusivity, first, f):
    """One program running ALL levels of one octave for `f` frames chained
    in VMEM: each level's Lt seeds the next without an HBM round trip.
    out_refs: per level (lt, lx, ly, ldet), blocks (f, h, w).

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
        out_refs[4 * li][...] = x
        lx, ly, ldet = _detector_chain(lsmooth, spec.sigma_size)
        out_refs[4 * li + 1][...] = lx
        out_refs[4 * li + 2][...] = ly
        out_refs[4 * li + 3][...] = ldet


@functools.partial(
    jax.jit, static_argnames=("specs", "diffusivity", "first", "f")
)
def fused_octave_batched(
    seed, k, specs, diffusivity: Diffusivity, first: bool, f: int = 1
):
    """Run one whole octave for a batch of frames with `f` frames per
    program (f must divide B), levels chained in VMEM.  Returns a flat list
    of (B, H, W) arrays, 4 per level (lt, lx, ly, ldet)."""
    b, h, w = seed.shape
    assert b % f == 0
    n_out = 4 * len(specs)
    kernel = functools.partial(
        _octave_kernel, specs=specs, diffusivity=diffusivity, first=first, f=f
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // f,),
        in_specs=[
            pl.BlockSpec((f, h, w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((f, h, w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * n_out,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.float32)] * n_out,
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
    """XLA dense candidate scores + sub-pixel offset fields for one level at
    native (B, h, w) resolution — same construction as kernels/detect_pallas
    (strict 3x3 max + threshold + static interior bounds; 2-var quadratic
    fit with rejected fits encoded as NaN).  Candidates are strictly
    interior (border >= 1), so edge-replicate vs padded-stack shift
    semantics can never differ on a selected site."""
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

    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    interior = jnp.asarray(
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
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
    nan = jnp.float32(jnp.nan)
    return score, jnp.where(keep, ox, nan), jnp.where(keep, oy, nan)


def _xla_octave(seed, k, ospecs, config, first):
    """XLA level chain for one octave on (B, h, w) frames; output order
    matches fused_octave_batched (lt, lx, ly, ldet per level)."""
    from akaze_tpu.frontend.scale_space import (
        conductivity, detector_response_level, fed_cycle, gaussian_blur, scharr,
    )

    kb = k.reshape(-1, 1, 1)
    x = seed
    outs = []
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
        outs.extend([x, lx, ly, ldet])
    return outs


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
    ("score", "ox", "oy" stacks, computed in XLA at native resolution right
    off each octave's outputs) — this replaces the separate per-(frame,
    level) detect_scores_pallas pass and its padded-stack HBM round trip."""
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
    lts, lxs, lys, ldets = [], [], [], []
    scores, oxs, oys = [], [], []
    for oi, (_, ospecs) in enumerate(octaves):
        if oi > 0:
            seed = half_size(lts[-1])
            k = k * config.contrast_octave_decay
        if oi < pallas_octaves:
            # One frame per program.  Batching frames per program (f > 1) to
            # amortize per-op cost was tried for the deep octaves and
            # abandoned: Mosaic compile time explodes on the narrow
            # (f, 60, 80)-shaped unrolled bodies (>> 10 min at f=16).
            outs = fused_octave_batched(
                seed, k, tuple(ospecs), config.diffusivity, first=(oi == 0), f=1
            )
        else:
            outs = _xla_octave(seed, k, ospecs, config, first=(oi == 0))
        for li, spec in enumerate(ospecs):
            lts.append(outs[4 * li])
            lxs.append(outs[4 * li + 1])
            lys.append(outs[4 * li + 2])
            ldets.append(outs[4 * li + 3])
            if with_detect:
                s_, ox_, oy_ = _dense_score_fields(
                    ldets[-1], int(spec.border), float(config.detector_threshold)
                )
                scores.append(s_)
                oxs.append(ox_)
                oys.append(oy_)
        seed = lts[-1]
    # Lt/Lx/Ly feed the Pallas patch gather (default-layout ANY operands):
    # level-major stacking keeps them copy-free (see stack_levels).  The
    # detect stacks stay frame-major for the vmapped detection path.
    out = {
        "Lt": stack_levels(lts, specs, level_major=True),
        "Lx": stack_levels(lxs, specs, level_major=True),
        "Ly": stack_levels(lys, specs, level_major=True),
        "Ldet": stack_levels(ldets, specs),
        "level_major": True,
    }
    if with_detect:
        out["score"] = stack_levels(scores, specs, fill=_NEG)
        out["ox"] = stack_levels(oxs, specs, fill=np.nan)
        out["oy"] = stack_levels(oys, specs, fill=np.nan)
    return out


def build_scale_space_pallas(img: jax.Array, statics, with_detect: bool = False) -> dict:
    """Single-frame wrapper over the batched builder.  Slicing the frame
    axis off both stack flavors yields identical (L, H0, W0) arrays, so the
    level_major flag is moot (and dropped) for single frames."""
    out = build_scale_space_pallas_batched(img[None], statics, with_detect)
    lm = out.pop("level_major", False)
    return {
        k: (v[:, 0] if lm and k in ("Lt", "Lx", "Ly") else v[0])
        for k, v in out.items()
    }
