"""JAX nonlinear scale-space construction (SURVEY.md §3.2 — hot loop A).

TPU-first design notes:
  * Every filter is separable shift-and-add on static shapes; XLA fuses the
    unrolled adds into a handful of HBM passes.  (A fused Pallas FED kernel
    replaces the tau loop on the TPU perf path; this module is the portable
    XLA implementation and the unit under parity test.)
  * The per-level loop (16 levels for the default config) is unrolled at
    trace time: level sizes, FED tau schedules, and filter kernels are all
    compile-time constants from `allocate_evolutions` (SURVEY.md §2 C3/C4).
  * Output is a `(L, H0, W0)` zero-padded *stack* per channel: level l
    occupies `[:h_l, :w_l]`.  A uniform stack makes every downstream gather
    (extrema, orientation, M-LDB) a single indexed op over static shapes —
    the TPU answer to the reference's per-level `Vec<GrayFloatImage>`.

Behavioral spec: SURVEY.md §2 C1/C5/C6/C7; parity oracle: akaze_tpu.golden.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig, Diffusivity
from akaze_tpu.core.fed import EvolutionSpec, allocate_evolutions
from akaze_tpu.golden.image import gaussian_kernel, scharr_kernels


def filter_1d(img: jax.Array, kernel: np.ndarray, axis: int) -> jax.Array:
    """Correlate along `axis` (negative: -1 = x, -2 = y) with edge padding.

    Lowered as a single `lax.conv_general_dilated` (cross-correlation, no
    kernel flip — matching golden.image._filter_1d) so the 16-level unrolled
    pipeline stays a small XLA graph.  f32 accumulation order may differ from
    the NumPy oracle by ulps; parity gates are tolerance-based.

    `precision=HIGHEST` is load-bearing on TPU: the default conv precision
    lowers the multiplies to bf16, which measured a 22.3 mean-Hamming-bit
    descriptor drift vs golden on the all-XLA octave path (round-3
    attribution table, BASELINE.md) — full-f32 convs are the fix.
    """
    axis = axis % img.ndim
    k = np.asarray(kernel, np.float32)
    half = len(k) // 2
    x = jnp.moveaxis(img, axis, -1)
    lead = x.shape[:-1]
    n = x.shape[-1]
    x = x.reshape(-1, 1, n)
    x = jnp.pad(x, ((0, 0), (0, 0), (half, half)), mode="edge")
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(k)[None, None, :], window_strides=(1,), padding="VALID",
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(out.reshape(*lead, n), -1, axis)


def separable_filter(img: jax.Array, kx: np.ndarray, ky: np.ndarray) -> jax.Array:
    """ky along rows (y) then kx along columns (x) — golden.image order."""
    return filter_1d(filter_1d(img, ky, axis=-2), kx, axis=-1)


def gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    k = gaussian_kernel(sigma)
    return separable_filter(img, k, k)


def scharr(img: jax.Array, x_order: int, y_order: int, sigma_size: int = 1) -> jax.Array:
    """Scaled Scharr derivative (SURVEY.md §2 C7), same kernels as golden."""
    assert (x_order, y_order) in ((1, 0), (0, 1))
    deriv, smooth = scharr_kernels(sigma_size)
    if x_order == 1:
        return separable_filter(img, kx=deriv, ky=smooth)
    return separable_filter(img, kx=smooth, ky=deriv)


def half_size(img: jax.Array) -> jax.Array:
    """2x2 box-mean downsample; trailing odd row/col dropped (golden parity)."""
    h2, w2 = img.shape[-2] // 2, img.shape[-1] // 2
    c = img[..., : 2 * h2, : 2 * w2]
    c = c.reshape(*c.shape[:-2], h2, 2, w2, 2)
    return 0.25 * (c[..., 0, :, 0] + c[..., 1, :, 0] + c[..., 0, :, 1] + c[..., 1, :, 1])


def compute_contrast_factor(img: jax.Array, config: AkazeConfig) -> jax.Array:
    """k = |grad| at the percentile of a histogram over interior pixels
    (SURVEY.md §2 C6)."""
    smoothed = gaussian_blur(img, 1.0)
    lx = scharr(smoothed, 1, 0, 1)
    ly = scharr(smoothed, 0, 1, 1)
    return contrast_factor_from_modg(jnp.sqrt(lx * lx + ly * ly), config)


def contrast_factor_from_modg(modg: jax.Array, config: AkazeConfig) -> jax.Array:
    """Histogram-percentile contrast factor from a precomputed |grad(G1*L)|
    plane (full-resolution; the 1-px frame is excluded here).

    Split out so the fused Mosaic base-stage kernel (kernels/fed_pallas
    base_stage_batched) can produce `modg` on-chip while this histogram
    stays in XLA (it needs two data-dependent global reduction passes).

    The histogram percentile is computed WITHOUT a scatter: `jnp.bincount`
    lowers to a serialized scatter-add on TPU (~1.2 ms/frame — ~25 % of the
    whole round-2 pipeline budget).  Only the first bin whose cumulative
    count crosses the percentile threshold is needed, and bin index is
    monotone in |grad|, so a two-stage coarse/fine count (~sqrt(nbins)
    vectorized compares per pixel each) finds the identical bin: first the
    coarse block containing the crossing, then the fine bin inside it.
    Bit-exact vs the bincount formulation (same `floor` quantization, same
    integer counts, same first-crossing argmax)."""
    modg = modg[..., 1:-1, 1:-1]
    hmax = jnp.max(modg)
    valid = modg > 0.0
    npoints = jnp.sum(valid)
    nbins = config.contrast_nbins
    safe_hmax = jnp.where(hmax > 0, hmax, 1.0)
    bins = jnp.minimum(
        jnp.floor(nbins * (modg / safe_hmax)).astype(jnp.int32), nbins - 1
    )
    bins = jnp.where(valid, bins, jnp.int32(-1))  # invalid pixels count nowhere
    nthreshold = npoints.astype(jnp.float32) * config.contrast_percentile

    ncoarse = int(math.ceil(math.sqrt(nbins)))
    nfine = -(-nbins // ncoarse)  # bins < ncoarse * nfine; top pads stay empty
    coarse = bins // nfine
    # Coarse histogram: (ncoarse,) counts by broadcast-compare + reduce.
    cidx = jnp.arange(ncoarse, dtype=jnp.int32)
    ccount = jnp.sum(
        coarse[..., None] == cidx, axis=tuple(range(coarse.ndim))
    ).astype(jnp.float32)
    ccsum = jnp.cumsum(ccount)
    ccrossed = ccsum >= nthreshold
    cblock = jnp.argmax(ccrossed).astype(jnp.int32)  # block holding the crossing
    below = jnp.where(cblock > 0, ccsum[jnp.maximum(cblock - 1, 0)], 0.0)
    # Fine histogram inside the crossing block only.
    fidx = jnp.arange(nfine, dtype=jnp.int32)
    in_block = coarse == cblock
    fcount = jnp.sum(
        jnp.where(in_block, bins - cblock * nfine, jnp.int32(-1))[..., None] == fidx,
        axis=tuple(range(bins.ndim)),
    ).astype(jnp.float32)
    fcsum = below + jnp.cumsum(fcount)
    fcrossed = fcsum >= nthreshold
    idx = (cblock * nfine + jnp.argmax(fcrossed)).astype(jnp.float32)
    k = safe_hmax * (idx + 1.0) / nbins
    bad = (hmax <= 0.0) | jnp.logical_not(jnp.any(ccrossed))
    return jnp.where(bad, config.contrast_fallback, k)


def conductivity(lx: jax.Array, ly: jax.Array, k: jax.Array, kind: Diffusivity) -> jax.Array:
    """g1 / g2 / Weickert diffusivities (SURVEY.md §2 C5)."""
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


def diffusion_step(lt: jax.Array, g: jax.Array, tau: float) -> jax.Array:
    """One explicit FED step of dL/dt = div(g grad L), zero-flux borders
    (SURVEY.md §2 C5): L += tau/2 * sum_n (g_c + g_n)(L_n - L_c)."""
    lp = jnp.pad(lt, [(0, 0)] * (lt.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    gp = jnp.pad(g, [(0, 0)] * (g.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    c, cg = lp[..., 1:-1, 1:-1], gp[..., 1:-1, 1:-1]
    step = (
        (cg + gp[..., 1:-1, 2:]) * (lp[..., 1:-1, 2:] - c)
        + (cg + gp[..., 1:-1, :-2]) * (lp[..., 1:-1, :-2] - c)
        + (cg + gp[..., 2:, 1:-1]) * (lp[..., 2:, 1:-1] - c)
        + (cg + gp[..., :-2, 1:-1]) * (lp[..., :-2, 1:-1] - c)
    )
    return lt + jnp.float32(0.5 * tau) * step


def fed_cycle(lt: jax.Array, g: jax.Array, taus: Sequence[float]) -> jax.Array:
    """All tau sweeps of one level as one `lax.scan` over the (static-length)
    tau schedule — one stencil body per level in the XLA graph instead of
    n_tau unrolled copies (compile-time control; SURVEY.md §3.2)."""
    if len(taus) == 0:
        return lt
    if len(taus) == 1:
        return diffusion_step(lt, g, taus[0])

    def body(carry, tau):
        return diffusion_step(carry, g, tau), None

    out, _ = jax.lax.scan(body, lt, jnp.asarray(taus, jnp.float32))
    return out


def build_levels(
    img: jax.Array, specs: List[EvolutionSpec], config: AkazeConfig
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Native-resolution (Lt, Lsmooth) per level (SURVEY.md §3.1 hot loop A)."""
    lt = gaussian_blur(img.astype(jnp.float32), config.base_scale_offset)
    lts = [lt]
    lsmooths = [lt]
    k = compute_contrast_factor(img, config)
    for i in range(1, len(specs)):
        if specs[i].octave > specs[i - 1].octave:
            lt = half_size(lt)
            k = k * config.contrast_octave_decay
        lsmooth = gaussian_blur(lt, 1.0)
        lx = scharr(lsmooth, 1, 0, 1)
        ly = scharr(lsmooth, 0, 1, 1)
        g = conductivity(lx, ly, k, config.diffusivity)
        lt = fed_cycle(lt, g, specs[i].taus)
        lts.append(lt)
        lsmooths.append(lsmooth)
    return lts, lsmooths


def detector_response_level(lsmooth: jax.Array, spec: EvolutionSpec):
    """sigma_size-scaled Scharr derivative chain and det-Hessian response
    for one level (SURVEY.md §2 C8)."""
    s = spec.sigma_size
    lx = scharr(lsmooth, 1, 0, s)
    ly = scharr(lsmooth, 0, 1, s)
    lxx = scharr(lx, 1, 0, s)
    lyy = scharr(ly, 0, 1, s)
    lxy = scharr(lx, 0, 1, s)
    sf = jnp.float32(s)
    s2 = jnp.float32(s * s)
    ldet = (lxx * s2) * (lyy * s2) - (lxy * s2) * (lxy * s2)
    return lx * sf, ly * sf, ldet


def stack_levels(
    levels: list[jax.Array],
    specs: List[EvolutionSpec],
    fill: float = 0.0,
    level_major: bool = False,
) -> jax.Array:
    """Pad each level into the octave-0 frame and stack: (L, H0, W0).
    Level l lives at [:h_l, :w_l]; the pad region is never read (the static
    interior masks exclude it).  `fill` pads candidate-score stacks with the
    -3e38 sentinel so padding can never win a top-k.

    level_major=True stacks batched (B, h, w) levels on axis 0 -> (L, B, H0,
    W0): the level writes are then contiguous in the DEFAULT layout, so XLA
    never inserts the (B, L, H0, W0) relayout copy that default-layout
    consumers (e.g. Pallas ANY-space operands) force on the axis=-3 stack
    (~1 ms/stack/batch16 on v5e)."""
    h0, w0 = specs[0].height, specs[0].width
    padded = []
    for lvl, spec in zip(levels, specs):
        pad = [(0, 0)] * (lvl.ndim - 2) + [(0, h0 - spec.height), (0, w0 - spec.width)]
        padded.append(jnp.pad(lvl, pad, constant_values=fill))
    return jnp.stack(padded, axis=0 if level_major else -3)


class ScaleSpaceStatics:
    """Static (compile-time) per-level metadata shared by the detection and
    description stages.  Pure numpy — safe to close over inside jit."""

    def __init__(self, width: int, height: int, config: AkazeConfig):
        self.config = config
        self.specs = allocate_evolutions(width, height, config)
        L = len(self.specs)
        self.num_levels = L
        self.h0, self.w0 = self.specs[0].height, self.specs[0].width
        self.widths = np.array([s.width for s in self.specs], np.int32)
        self.heights = np.array([s.height for s in self.specs], np.int32)
        self.octaves = np.array([s.octave for s in self.specs], np.int32)
        self.ratios = np.array([s.ratio for s in self.specs], np.float32)
        self.esigmas = np.array([s.esigma for s in self.specs], np.float32)
        self.sigma_sizes = np.array([s.sigma_size for s in self.specs], np.int32)
        self.borders = np.array([s.border for s in self.specs], np.int32)
        self.sizes = (self.esigmas * config.derivative_factor).astype(np.float32)
        # Static interior mask (L, H0, W0): inside the per-level border.
        ys = np.arange(self.h0)[None, :, None]
        xs = np.arange(self.w0)[None, None, :]
        b = self.borders[:, None, None]
        self.interior = (
            (ys >= b)
            & (ys < self.heights[:, None, None] - b)
            & (xs >= b)
            & (xs < self.widths[:, None, None] - b)
        )


def build_scale_space(img: jax.Array, statics: ScaleSpaceStatics):
    """Full stacked scale space: returns dict of (L, H0, W0) arrays
    Lt, Lx, Ly, Ldet (Lx/Ly sigma-scaled detector derivatives)."""
    specs = statics.specs
    lts, lsmooths = build_levels(img, specs, statics.config)
    lxs, lys, ldets = [], [], []
    for lsmooth, spec in zip(lsmooths, specs):
        lx, ly, ldet = detector_response_level(lsmooth, spec)
        lxs.append(lx)
        lys.append(ly)
        ldets.append(ldet)
    return {
        "Lt": stack_levels(lts, specs),
        "Lx": stack_levels(lxs, specs),
        "Ly": stack_levels(lys, specs),
        "Ldet": stack_levels(ldets, specs),
    }
