"""Degenerate-input behavior of the jitted front-end (the fixed-capacity
SoA design must degrade to empty results, never crash or emit garbage).

Probes from the verify recipe: constant image, sub-minimum-octave image,
empty descriptor sets into match, non-grayscale input rejection.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from akaze_tpu.core.config import AkazeConfig, MatchConfig
from akaze_tpu.frontend.pipeline import extract
from akaze_tpu.golden import akaze as golden
from akaze_tpu.matching.hamming import match
from akaze_tpu.utils.synthetic import textured_scene

CFG = AkazeConfig(max_keypoints=128, per_level_candidates=32)


def test_constant_image_yields_no_keypoints():
    feats = extract(np.full((96, 128), 0.5, np.float32), CFG)
    assert int(np.asarray(feats.keypoints.valid).sum()) == 0


def test_sub_40px_image_runs_and_matches_golden():
    # Below min_octave_dim only octave 0 survives; the descriptor border
    # (~10*sqrt(2) px) legitimately leaves no describable keypoints here —
    # the gate is "no crash, same count as the golden oracle".
    img = textured_scene(36, 38, seed=2)
    feats = extract(img, CFG)
    n_tpu = int(np.asarray(feats.keypoints.valid).sum())
    n_gold = len(golden.extract(img, CFG).keypoints)
    assert n_tpu == n_gold == 0


def test_empty_descriptor_set_matches_nothing():
    feats = extract(textured_scene(96, 128, seed=1), CFG)
    empty = jnp.zeros((CFG.max_keypoints, CFG.descriptor_words), jnp.uint32)
    none = jnp.zeros((CFG.max_keypoints,), bool)
    for a, va, b, vb in [
        (empty, none, feats.descriptors, feats.keypoints.valid),
        (feats.descriptors, feats.keypoints.valid, empty, none),
        (empty, none, empty, none),
    ]:
        assert int(match(a, va, b, vb, MatchConfig()).count()) == 0


def test_kitti_shaped_odd_dimensions():
    # The reference regression-tests on KITTI-style 1241x376 frames
    # (SURVEY.md §2 C15): odd, non-tile-aligned dims must extract cleanly.
    img = textured_scene(376, 1241, seed=13)
    feats = extract(img, AkazeConfig())
    valid = np.asarray(feats.keypoints.valid)
    assert int(valid.sum()) > 100
    x, y = np.asarray(feats.keypoints.x)[valid], np.asarray(feats.keypoints.y)[valid]
    assert (x >= 0).all() and (x < 1241).all()
    assert (y >= 0).all() and (y < 376).all()


def test_uint8_input_normalizes_like_reference():
    # Reference loads images as f32 [0,1] (SURVEY §2 C1); a uint8 frame
    # must behave exactly like its /255 float equivalent, not be silently
    # mis-scaled 255x against [0,1]-tuned thresholds.
    u8 = (textured_scene(96, 128, seed=1) * 255).astype(np.uint8)
    fu = extract(u8, CFG)
    ff = extract(u8.astype(np.float32) / 255.0, CFG)
    np.testing.assert_array_equal(
        np.asarray(fu.keypoints.valid), np.asarray(ff.keypoints.valid)
    )
    v = np.asarray(ff.keypoints.valid)
    np.testing.assert_array_equal(
        np.asarray(fu.descriptors)[v], np.asarray(ff.descriptors)[v]
    )
    # XLA may lower /255 as reciprocal-multiply: inputs differ by 1 ulp,
    # so sub-pixel refinement wiggles in the last bits.
    np.testing.assert_allclose(
        np.asarray(fu.keypoints.x)[v], np.asarray(ff.keypoints.x)[v], atol=1e-4
    )


def test_nan_region_degrades_gracefully():
    # A corrupt (NaN) sensor region must suppress detections there without
    # crashing or leaking non-finite outputs elsewhere.
    img = textured_scene(96, 128, seed=1).copy()
    img[40:44, 60:64] = np.nan
    feats = extract(img, CFG)
    v = np.asarray(feats.keypoints.valid)
    assert np.isfinite(np.asarray(feats.keypoints.x)[v]).all()
    assert np.isfinite(np.asarray(feats.keypoints.y)[v]).all()
    assert np.isfinite(np.asarray(feats.keypoints.response)[v]).all()


def test_multichannel_input_rejected():
    with pytest.raises(Exception):
        extract(np.zeros((32, 32, 3), np.float32), CFG)
