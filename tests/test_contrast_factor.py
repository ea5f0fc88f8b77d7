"""Unit gate for the scatter-free contrast-factor percentile.

`frontend.scale_space.compute_contrast_factor` replaces the `jnp.bincount`
scatter-add (serialized on TPU) with a two-stage coarse/fine counting scheme
(SURVEY.md §2 C6).  The transformation must be EXACT — same floor
quantization, same integer counts, same first-crossing bin — so this test
pins it to a direct bincount oracle built from the same filter outputs,
across image content, bin counts, and percentiles.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend import scale_space
from akaze_tpu.utils.synthetic import textured_scene


def _bincount_oracle(img: np.ndarray, config: AkazeConfig) -> float:
    """SURVEY §2 C6 percentile via np.bincount, on the frontend's own
    filter outputs (isolates the counting scheme, not the filters)."""
    smoothed = np.asarray(scale_space.gaussian_blur(jnp.asarray(img), 1.0))
    lx = np.asarray(scale_space.scharr(jnp.asarray(smoothed), 1, 0, 1))
    ly = np.asarray(scale_space.scharr(jnp.asarray(smoothed), 0, 1, 1))
    modg = np.sqrt(lx * lx + ly * ly)[1:-1, 1:-1]
    hmax = float(modg.max())
    if hmax == 0.0:
        return config.contrast_fallback
    valid = modg > 0.0
    npoints = int(valid.sum())
    nbins = config.contrast_nbins
    bins = np.minimum(
        np.floor(nbins * (modg[valid].astype(np.float32) / np.float32(hmax))).astype(
            np.int64
        ),
        nbins - 1,
    )
    csum = np.cumsum(np.bincount(bins, minlength=nbins))
    idx = np.argwhere(csum >= npoints * config.contrast_percentile)
    if idx.size == 0:
        return config.contrast_fallback
    return hmax * float(idx[0, 0] + 1) / nbins


@pytest.mark.parametrize("nbins", [7, 64, 300, 301])
@pytest.mark.parametrize("percentile", [0.05, 0.7, 0.99])
def test_matches_bincount_oracle(nbins, percentile):
    cfg = dataclasses.replace(
        AkazeConfig(), contrast_nbins=nbins, contrast_percentile=percentile
    )
    for seed in range(4):
        img = textured_scene(60, 80, seed=seed)
        got = float(scale_space.compute_contrast_factor(jnp.asarray(img), cfg))
        want = _bincount_oracle(img, cfg)
        assert got == pytest.approx(want, rel=1e-6), (nbins, percentile, seed)


def test_constant_image_falls_back():
    cfg = AkazeConfig()
    k = float(scale_space.compute_contrast_factor(jnp.full((48, 64), 0.5), cfg))
    assert k == pytest.approx(cfg.contrast_fallback)


def test_quantized_image_ties():
    # Few distinct gradient values -> heavy bin ties; first-crossing
    # selection must still agree with the oracle.
    cfg = dataclasses.replace(AkazeConfig(), contrast_nbins=16)
    rng = np.random.default_rng(3)
    img = (rng.integers(0, 3, size=(50, 70)) / 2.0).astype(np.float32)
    got = float(scale_space.compute_contrast_factor(jnp.asarray(img), cfg))
    want = _bincount_oracle(img, cfg)
    assert got == pytest.approx(want, rel=1e-6)
