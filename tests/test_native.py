"""Native C++ matcher parity vs the golden NumPy matcher."""

import numpy as np
import pytest

from akaze_tpu import native
from akaze_tpu.core.config import MatchConfig
from akaze_tpu.golden import matching as gmatch

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable — native matcher not built"
)


def _random_descs(rng, n, words=16):
    d = rng.integers(0, 2**32, size=(n, words), dtype=np.uint32)
    d[:, -1] &= (1 << 6) - 1
    return d


@pytest.mark.parametrize("mutual", [True, False])
def test_native_matches_golden(mutual):
    rng = np.random.default_rng(0)
    a = _random_descs(rng, 100)
    b = _random_descs(rng, 120)
    b[:40] = a[:40]
    cfg = MatchConfig(mutual=mutual)
    gold = gmatch.match(a, b, cfg)
    idx, dist, acc = native.match_hamming_native(
        a, b, ratio=cfg.ratio, mutual=cfg.mutual, max_distance=cfg.max_distance
    )
    got = {(int(i), int(idx[i])) for i in np.nonzero(acc)[0]}
    want = {(int(i), int(j)) for i, j in gold}
    assert got == want
    assert len(want) >= 35
    # Distances agree with the brute-force matrix.
    d = gmatch.hamming_distance_matrix(a, b)
    np.testing.assert_array_equal(dist, d[np.arange(100), idx])


def test_native_empty_inputs():
    a = np.zeros((0, 16), np.uint32)
    b = np.zeros((4, 16), np.uint32)
    idx, dist, acc = native.match_hamming_native(a, b)
    assert idx.shape == (0,)
    idx, dist, acc = native.match_hamming_native(b, a)
    assert not acc.any()


def test_native_extract_parity_vs_golden():
    """The C++ single-core AKAZE (the measured-baseline stand-in for the
    reference binary) must agree with the golden oracle nearly bitwise:
    same sequential extrema semantics, same filters, same M-LDB layout."""
    from akaze_tpu.golden import akaze
    from akaze_tpu.utils.synthetic import textured_scene

    img = textured_scene(180, 240, seed=11)
    kps, desc = native.extract_native(img)
    gold = akaze.extract(img)
    assert len(kps) == len(gold.keypoints)
    gk = np.array(
        [[k.x, k.y, k.class_id, k.angle] for k in gold.keypoints], np.float32
    )
    # Same order (identical raster/level traversal), near-identical values.
    assert np.abs(kps[:, 0] - gk[:, 0]).max() < 1e-3
    assert np.abs(kps[:, 1] - gk[:, 1]).max() < 1e-3
    np.testing.assert_array_equal(kps[:, 5].astype(int), gk[:, 2].astype(int))
    assert np.abs(kps[:, 6] - gk[:, 3]).max() < 1e-4
    bits = np.unpackbits(np.bitwise_xor(desc, gold.descriptors), axis=1).sum(1)
    assert bits.mean() < 0.5 and bits.max() <= 4


def test_native_bench_pipeline_runs():
    from akaze_tpu.utils.synthetic import video_sequence

    pair = video_sequence(2, 120, 160, seed=3)
    sec = native.bench_pipeline_native(pair[0], pair[1], reps=1)
    assert 0.0 < sec < 60.0
