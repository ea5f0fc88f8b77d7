"""Pallas one-pass matcher vs the dense XLA formulation (interpret mode).

The kernel must reproduce matching/hamming.py's outputs exactly, including
argmin tie-breaks (duplicate descriptors are common in low-texture content),
so the comparison is strict equality on idx_b/distance/accepted.
"""

import numpy as np
import pytest

from akaze_tpu.core.config import MatchConfig
from akaze_tpu.matching.hamming import match_fn


def _random_descs(rng, n, words=16):
    d = rng.integers(0, 2**32, size=(n, words), dtype=np.uint32)
    d[:, -1] &= (1 << 6) - 1
    return d


def _run_both(a, va, b, vb, cfg, monkeypatch):
    monkeypatch.setenv("AKAZE_MATCH", "xla")
    ref = match_fn(a, va, b, vb, cfg)
    monkeypatch.setenv("AKAZE_MATCH", "pallas")
    got = match_fn(a, va, b, vb, cfg)
    return ref, got


@pytest.mark.parametrize("ka,kb", [(64, 80), (256, 256), (512, 128)])
@pytest.mark.parametrize("mutual", [True, False])
def test_pallas_match_equals_xla(monkeypatch, ka, kb, mutual):
    rng = np.random.default_rng(ka + kb + mutual)
    a = _random_descs(rng, ka)
    b = _random_descs(rng, kb)
    # Plant exact + near correspondences and DUPLICATES (tie-break stress).
    n = min(ka, kb) // 2
    b[:n] = a[:n]
    a[ka // 2 :] = a[: ka - ka // 2]  # duplicate rows in A
    b[kb - 8 :] = b[:8]  # duplicate rows in B
    va = rng.random(ka) > 0.1
    vb = rng.random(kb) > 0.1
    cfg = MatchConfig(mutual=mutual)
    ref, got = _run_both(a, va, b, vb, cfg, monkeypatch)
    np.testing.assert_array_equal(np.asarray(ref.idx_b), np.asarray(got.idx_b))
    np.testing.assert_array_equal(
        np.asarray(ref.distance), np.asarray(got.distance)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.accepted), np.asarray(got.accepted)
    )
    assert np.asarray(got.accepted).sum() > 0


def test_pallas_match_all_invalid_b(monkeypatch):
    rng = np.random.default_rng(7)
    a = _random_descs(rng, 64)
    b = _random_descs(rng, 64)
    ref, got = _run_both(
        a, np.ones(64, bool), b, np.zeros(64, bool), MatchConfig(), monkeypatch
    )
    assert not np.asarray(got.accepted).any()
    np.testing.assert_array_equal(
        np.asarray(ref.accepted), np.asarray(got.accepted)
    )
