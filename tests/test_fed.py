"""Unit tests for the FED tau scheduler (SURVEY.md §4: taus positive, sum to
the cycle time; prime finder; evolution allocation)."""

import math

import pytest

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.core.fed import (
    allocate_evolutions,
    fed_is_prime,
    fed_tau_by_cycle_time,
    fed_tau_by_process_time,
    fed_tau_internal,
)


def test_prime():
    primes = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31}
    for n in range(2, 32):
        assert fed_is_prime(n) == (n in primes), n


@pytest.mark.parametrize("t", [0.3, 1.0, 2.56, 7.3, 20.0])
def test_taus_positive_and_sum_to_cycle_time(t):
    taus = fed_tau_by_cycle_time(t, 0.25, reordering=True)
    assert len(taus) >= 1
    assert all(tau > 0 for tau in taus)
    assert math.isclose(sum(taus), t, rel_tol=1e-9)


def test_reordering_is_permutation():
    t = 5.0
    plain = fed_tau_by_cycle_time(t, 0.25, reordering=False)
    reordered = fed_tau_by_cycle_time(t, 0.25, reordering=True)
    assert sorted(plain) == pytest.approx(sorted(reordered))
    assert plain != reordered  # kappa reordering actually permutes for n > 2


def test_tau_max_respected():
    # Largest tau is scale*tau_max/2 / cos^2(pi(2n-1)/(4n+2)); the *stability*
    # guarantee of FED is on the cycle, but each tauh_0 <= tau_max * scale/2 * ...
    # We check the documented formula directly instead.
    n, scale, tau_max = 7, 1.3, 0.25
    taus = fed_tau_internal(n, scale, tau_max, reordering=False)
    c = 1.0 / (4.0 * n + 2.0)
    for j, tau in enumerate(taus):
        expected = scale * tau_max / 2.0 / math.cos(math.pi * (2 * j + 1) * c) ** 2
        assert tau == pytest.approx(expected)


def test_process_time_splits_cycles():
    one = fed_tau_by_process_time(4.0, 1)
    two = fed_tau_by_process_time(4.0, 2)
    assert math.isclose(sum(one), 4.0, rel_tol=1e-9)
    assert math.isclose(sum(two), 2.0, rel_tol=1e-9)


def test_allocate_evolutions_vga():
    cfg = AkazeConfig()
    evs = allocate_evolutions(640, 480, cfg)
    assert len(evs) == 16  # all 4 octaves survive at VGA
    assert [e.octave for e in evs] == [o for o in range(4) for _ in range(4)]
    assert evs[0].esigma == pytest.approx(1.6)
    assert evs[0].etime == pytest.approx(0.5 * 1.6**2)
    # esigma doubles per octave.
    assert evs[4].esigma == pytest.approx(2 * evs[0].esigma)
    assert (evs[4].width, evs[4].height) == (320, 240)
    # taus of every level > 0 sum to the etime difference.
    for prev, ev in zip(evs, evs[1:]):
        assert sum(ev.taus) == pytest.approx(ev.etime - prev.etime)
    # sigma_size stays in level units (small), per SURVEY.md §2 C8.
    assert all(1 <= e.sigma_size <= 5 for e in evs)


def test_allocate_evolutions_drops_small_octaves():
    cfg = AkazeConfig()
    evs = allocate_evolutions(200, 160, cfg)
    # 160 -> 80 -> 40 -> 20: the 4th octave (min dim 20 < 40) is dropped.
    assert len(evs) == 12
