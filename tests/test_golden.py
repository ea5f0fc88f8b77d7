"""Golden-model unit + integration tests (SURVEY.md §4 test strategy)."""

import math

import numpy as np
import pytest

from akaze_tpu.core.config import AkazeConfig, Diffusivity, MatchConfig
from akaze_tpu.golden import akaze as golden
from akaze_tpu.golden import matching as gmatch
from akaze_tpu.golden.image import (
    gaussian_blur,
    gaussian_kernel,
    half_size,
    scharr,
    scharr_kernels,
)


def test_gaussian_kernel_normalized_symmetric():
    for sigma in (1.0, 1.6, 2.5):
        k = gaussian_kernel(sigma)
        assert k.sum() == pytest.approx(1.0, abs=1e-6)
        assert np.allclose(k, k[::-1])


def test_gaussian_blur_preserves_constant():
    img = np.full((32, 40), 0.37, dtype=np.float32)
    out = gaussian_blur(img, 1.6)
    assert np.allclose(out, 0.37, atol=1e-6)


def test_scharr_kernels_shape_and_norm():
    deriv, smooth = scharr_kernels(1)
    assert np.allclose(deriv, [-1, 0, 1])
    # [3, 10, 3] / 32 (SURVEY.md §2 C7: norm = 1/(2*sigma*(w+2)), w = 10/3).
    assert np.allclose(smooth, np.array([3, 10, 3]) / 32.0, atol=1e-7)
    deriv3, smooth3 = scharr_kernels(3)
    assert len(deriv3) == 7 and deriv3[0] == -1 and deriv3[-1] == 1
    assert smooth3.sum() == pytest.approx((10.0 / 3.0 + 2.0) / (2 * 3 * (10.0 / 3.0 + 2)))


def test_scharr_antisymmetric_zero_on_constant():
    img = np.full((20, 20), 0.5, dtype=np.float32)
    assert np.allclose(scharr(img, 1, 0, 2), 0.0, atol=1e-7)


def test_scharr_linear_ramp_gradient():
    # On a ramp img = x/W the x-derivative is constant: deriv taps are
    # [-1 ... +1] spaced 2*sigma_size apart -> response = 2*sigma_size/W * sum(smooth).
    h, w = 24, 30
    img = (np.arange(w, dtype=np.float32) / w)[None, :].repeat(h, 0)
    for s in (1, 2):
        _, smooth = scharr_kernels(s)
        expected = 2.0 * s / w * smooth.sum()
        got = scharr(img, 1, 0, s)[s:-s, s:-s]
        assert np.allclose(got, expected, atol=1e-6)
        assert np.allclose(scharr(img, 0, 1, s), 0.0, atol=1e-6)


def test_half_size():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = half_size(img)
    assert out.shape == (2, 2)
    assert out[0, 0] == pytest.approx((0 + 1 + 4 + 5) / 4)


def test_diffusion_step_preserves_constant():
    lt = np.full((16, 16), 0.7, dtype=np.float32)
    g = np.random.default_rng(0).uniform(0.1, 1.0, (16, 16)).astype(np.float32)
    out = golden.diffusion_step(lt, g, 0.25)
    assert np.allclose(out, 0.7, atol=1e-6)


def test_diffusion_step_conserves_mass():
    rng = np.random.default_rng(1)
    lt = rng.uniform(0, 1, (24, 24)).astype(np.float32)
    g = rng.uniform(0.2, 1.0, (24, 24)).astype(np.float32)
    out = golden.diffusion_step(lt, g, 0.2)
    # Zero-flux boundaries conserve the integral.
    assert out.sum() == pytest.approx(lt.sum(), rel=1e-5)


def test_contrast_factor_on_ramp():
    # A pure ramp has a single gradient magnitude -> k lands at hmax * bin/nbins
    # one bin above the (only) populated bin... all mass in the last bin.
    cfg = AkazeConfig()
    img = (np.arange(100, dtype=np.float32) / 100)[None, :].repeat(80, 0)
    k = golden.compute_contrast_factor(img, cfg)
    assert k > 0
    # All interior gradients equal (to fp tolerance) -> all histogram mass in
    # the top bin -> k = hmax = ramp slope (0.01/px) * 2 taps * smooth sum (0.5).
    assert k == pytest.approx(0.01, rel=0.01)


def test_conductivity_variants():
    lx = np.array([[0.0, 1.0]], dtype=np.float32)
    ly = np.zeros_like(lx)
    k = 1.0
    g2 = golden.conductivity_np(lx, ly, k, Diffusivity.PM_G2)
    assert g2[0, 0] == pytest.approx(1.0)
    assert g2[0, 1] == pytest.approx(0.5)
    g1 = golden.conductivity_np(lx, ly, k, Diffusivity.PM_G1)
    assert g1[0, 0] == pytest.approx(1.0)
    assert g1[0, 1] == pytest.approx(math.exp(-1.0))
    gw = golden.conductivity_np(lx, ly, k, Diffusivity.WEICKERT)
    assert gw[0, 0] == pytest.approx(1.0)
    assert gw[0, 1] == pytest.approx(1.0 - math.exp(-3.315))


def test_extract_integration(small_image):
    cfg = AkazeConfig()
    result = golden.extract(small_image, cfg)
    n = len(result.keypoints)
    assert 20 < n < 2000, n
    assert result.descriptors.shape == (n, 61)
    assert result.descriptors_u32.shape == (n, 16)
    # Descriptors are informative: not all-zero, not all-ones.
    bits = np.unpackbits(result.descriptors, axis=1).sum(axis=1)
    assert bits.min() > 0
    assert bits.max() < 486
    for kp in result.keypoints:
        assert 0 <= kp.x < small_image.shape[1]
        assert 0 <= kp.y < small_image.shape[0]
        assert 0.0 <= kp.angle < 2 * math.pi + 1e-6
        assert kp.response > cfg.detector_threshold


def test_extract_deterministic(small_image):
    a = golden.extract(small_image)
    b = golden.extract(small_image)
    assert np.array_equal(a.descriptors, b.descriptors)
    assert [(k.x, k.y) for k in a.keypoints] == [(k.x, k.y) for k in b.keypoints]


def test_self_match(small_image):
    res = golden.extract(small_image)
    matches = gmatch.match(res.descriptors_u32, res.descriptors_u32, MatchConfig())
    # Matching a frame against itself: nearly every keypoint matches itself at
    # distance 0 (duplicate descriptors can shadow a few).
    assert matches.shape[0] > 0.9 * len(res.keypoints)
    same = matches[:, 0] == matches[:, 1]
    assert same.mean() > 0.95


def test_hamming_distance_matrix():
    a = np.array([[0b1011, 0], [0, 0]], dtype=np.uint32)
    b = np.array([[0b0011, 0], [0xFFFFFFFF, 0]], dtype=np.uint32)
    d = gmatch.hamming_distance_matrix(a, b)
    assert d[0, 0] == 1
    assert d[1, 0] == 2
    assert d[1, 1] == 32
