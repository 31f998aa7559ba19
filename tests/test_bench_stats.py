"""Unit tests for bench.py's pure statistics helpers — the adaptive
extra-pass selection and trimmed noise spread added in r10. No Spark
session needed; importing bench only loads the module."""

from __future__ import annotations

import bench


def test_median_odd_even():
    assert bench.median([3.0]) == 3.0
    assert bench.median([1.0, 9.0, 2.0]) == 2.0
    assert bench.median([1.0, 2.0, 3.0, 4.0]) == 2.5


def test_median_of_five_absorbs_two_burst_reps():
    """The design property the r10 rework rests on: with 5 samples, two
    CPU-steal burst reps cannot move the median (r9's neardup_embedding
    published 2.23x vs_r01 from exactly this trace shape at 3 reps)."""
    assert bench.median([1.13, 1.08, 3.61, 1.21, 3.37]) == 1.21
    # ...but at 3 reps, two bursts DO capture the median
    assert bench.median([5.5, 2.28, 1.01]) == 2.28


def test_rep_spread_trims_only_at_five_samples():
    # n=3: raw max/min
    assert bench.rep_spread([1.0, 2.0, 4.0]) == 4.0
    # n=5: one high + one low dropped -> 2.0/1.0
    assert bench.rep_spread([1.0, 1.0, 2.0, 2.0, 40.0]) == 2.0
    # n=4: still raw (trim would leave too few)
    assert bench.rep_spread([1.0, 1.0, 2.0, 40.0]) == 40.0


def test_pick_noisy_selects_subsecond_and_bursty():
    samples = {
        "fast": [0.3, 0.4, 0.35],  # sub-second -> extra reps
        "bursty": [1.5, 1.6, 4.8],  # spread > 1.5, median < 5 -> extra
        "steady": [2.0, 2.1, 2.05],  # >= 1 s, tight -> no extra
        "heavy_noisy": [30.0, 31.0, 55.0],  # median >= 5 s -> bounded out
        "broken": [0.1],  # failed mid-run -> excluded
        "never_ran": [],  # no samples -> excluded
    }
    got = set(bench.pick_noisy(samples, failed={"broken"}))
    assert got == {"fast", "bursty"}


def test_pick_noisy_zero_guard():
    # a 0.0 rep (clock resolution) must not divide by zero
    assert bench.pick_noisy({"q": [0.0, 0.0, 0.0]}, failed=set()) == ["q"]
