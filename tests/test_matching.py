"""TPU matcher vs golden oracle + two-view matching integration."""

import numpy as np

from akaze_tpu.core.config import MatchConfig
from akaze_tpu.frontend.pipeline import extract
from akaze_tpu.golden import matching as gmatch
from akaze_tpu.matching.hamming import match, match_features
from akaze_tpu.utils.synthetic import textured_scene, warp_homography


def _random_descs(rng, n, words=16):
    d = rng.integers(0, 2**32, size=(n, words), dtype=np.uint32)
    d[:, -1] &= (1 << 6) - 1  # only 486 bits used
    return d


def test_matcher_parity_with_golden():
    rng = np.random.default_rng(0)
    a = _random_descs(rng, 64)
    b = _random_descs(rng, 80)
    # Plant exact correspondences so some matches survive the ratio test.
    b[:32] = a[:32]
    cfg = MatchConfig()
    gold = gmatch.match(a, b, cfg)
    res = match(a, np.ones(64, bool), b, np.ones(80, bool), cfg)
    acc = np.asarray(res.accepted)
    got = {(i, int(np.asarray(res.idx_b)[i])) for i in np.nonzero(acc)[0]}
    want = {(int(i), int(j)) for i, j in gold}
    assert got == want
    assert len(want) >= 30


def test_invalid_slots_never_match():
    rng = np.random.default_rng(1)
    a = _random_descs(rng, 16)
    b = a.copy()
    valid_a = np.ones(16, bool)
    valid_a[3] = False
    valid_b = np.ones(16, bool)
    valid_b[5] = False
    res = match(a, valid_a, b, valid_b)
    acc = np.asarray(res.accepted)
    assert not acc[3]
    assert not acc[5]  # its identical partner is invalid in B
    assert acc.sum() == 14


def test_two_view_matching(small_image):
    """BASELINE.md config 2 front half: features from a warped pair match and
    the implied displacements agree with the homography."""
    H = np.array([[1.0, 0.02, 6.0], [-0.015, 1.0, -4.0], [1e-5, 0.0, 1.0]])
    warped = warp_homography(small_image, H)
    fa = extract(small_image)
    fb = extract(warped)
    res = match_features(fa, fb)
    acc = np.asarray(res.accepted)
    n = acc.sum()
    assert n >= 10, n
    ia = np.nonzero(acc)[0]
    ib = np.asarray(res.idx_b)[ia]
    xa = np.asarray(fa.keypoints.x)[ia]
    ya = np.asarray(fa.keypoints.y)[ia]
    xb = np.asarray(fb.keypoints.x)[ib]
    yb = np.asarray(fb.keypoints.y)[ib]
    w = H[2, 0] * xa + H[2, 1] * ya + H[2, 2]
    xe = (H[0, 0] * xa + H[0, 1] * ya + H[0, 2]) / w
    ye = (H[1, 0] * xa + H[1, 1] * ya + H[1, 2]) / w
    err = np.sqrt((xb - xe) ** 2 + (yb - ye) ** 2)
    assert np.median(err) < 2.0, np.median(err)
