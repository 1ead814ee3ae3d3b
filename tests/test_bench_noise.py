"""bench.py noise self-defense (round-4 brief #8): the steal-rate
verdict that marks a dirty window `noisy` and triggers the retry."""

import bench


def test_clean_windows_from_recorded_official_runs():
    # r4 official: steal 87 over 41.4 s (the 15.04 s headline)
    assert not bench.is_noisy(87, 41.4)
    # r3 confirmation run: steal 1219 over a ~2 min A/B window
    assert not bench.is_noisy(1219, 120.0)


def test_noisy_windows_from_recorded_dirty_runs():
    # the two r4-verdict re-runs whose minhash tracked steal 3-4x
    assert bench.is_noisy(12_245, 150.0)
    assert bench.is_noisy(29_614, 160.0)
    # this round's own sf0.01 verify run
    assert bench.is_noisy(9_304, 109.6)


def test_threshold_boundary_and_degenerate_wall():
    rate = bench.NOISY_STEAL_RATE
    assert not bench.is_noisy(int(rate * 100), 100.0)  # exactly at rate
    assert bench.is_noisy(int(rate * 100) + 1, 100.0)  # just above
    assert not bench.is_noisy(10_000, 0.0)  # zero wall never divides
