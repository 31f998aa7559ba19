"""Unit tests for bench.py's pure statistics helpers — the adaptive
extra-pass selection and trimmed noise spread added in r10. No Spark
session needed; importing bench only loads the module."""

from __future__ import annotations

import bench


def test_median_odd_even():
    assert bench.median([3.0]) == 3.0
    assert bench.median([1.0, 9.0, 2.0]) == 2.0
    assert bench.median([1.0, 2.0, 3.0, 4.0]) == 2.5


def test_query_stat_absorbs_burst_reps():
    """The design property the r10 rework rests on. One-sided burst
    contamination: r9's neardup_embedding published 2.23x vs_r01 from
    [5.5, 2.28, 1.01] at 3 reps (two bursts capture a 3-rep median);
    a later run slowed one whole extra PASS, putting 3 of 5 reps high —
    which even a plain 5-rep median cannot absorb. The lower-trimmed
    median handles both."""
    # two bursts in 5 reps: plain median would work, trimmed also works
    assert bench.query_stat([1.13, 1.08, 3.61, 1.21, 3.37]) == 1.13
    # three elevated reps of 5 (the slowed-pass shape, observed as
    # payload_byte_stats [0.471, 0.432, 1.13, 1.126, 0.862]): plain
    # median publishes 0.862 (2.04x r1); lowest-3 median stays clean
    assert bench.query_stat([0.471, 0.432, 1.13, 1.126, 0.862]) == 0.471
    # n=3: plain median (robust to 1 burst, the base-pass contract)
    assert bench.query_stat([5.5, 2.28, 1.01]) == 2.28
    assert bench.query_stat([1.0, 9.0, 1.2]) == 1.2


def test_query_stat_shows_genuine_regressions():
    """A real regression is slow in EVERY rep — the lowest-3 median
    reports it at full size, so the trim cannot hide a true slowdown."""
    assert bench.query_stat([4.0, 4.2, 4.1, 4.3, 4.05]) == 4.05
    assert bench.query_stat([4.0, 4.2, 4.1]) == 4.1


def test_plain_median_twin_is_like_for_like_with_r01():
    """r11: vs_r01 must divide plain medians by r01's plain medians —
    one estimator across the whole series. The trimmed stat on the same
    reps is lower by construction at n>=5; publishing both keeps the
    headline steal-robust without biasing the cross-round ratio."""
    reps = [1.13, 1.08, 3.61, 1.21, 3.37]
    assert bench.median(reps) == 1.21  # the vs_r01 numerator
    assert bench.query_stat(reps) == 1.13  # the headline column
    assert bench.query_stat(reps) <= bench.median(reps)


def test_rep_spread_raw_measures_the_machine_not_the_estimator():
    # trimmed spread ignores burst reps; raw spread must not
    assert bench.rep_spread([1.0, 1.0, 2.0, 2.0, 40.0]) == 2.0
    assert bench.rep_spread_raw([1.0, 1.0, 2.0, 2.0, 40.0]) == 40.0
    assert bench.rep_spread_raw([2.0, 1.0, 4.0]) == 4.0


def test_rep_spread_mirrors_query_stat_samples():
    # n=3: raw max/min over all reps
    assert bench.rep_spread([1.0, 2.0, 4.0]) == 4.0
    # n=5: spread over the lowest 3 (the samples query_stat uses)
    assert bench.rep_spread([1.0, 1.0, 2.0, 2.0, 40.0]) == 2.0
    assert bench.rep_spread([1.0, 1.1, 1.2, 30.0, 40.0]) == 1.2
    # n=4: still raw (stat is a plain median there too)
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


def test_proc_delta_computes_steal_share():
    from bench import proc_delta

    before = {
        "loadavg_1m": 1.0,
        "cpu_total_jiffies": 1000,
        "cpu_idle_jiffies": 400,
        "cpu_steal_jiffies": 10,
    }
    after = {
        "loadavg_1m": 8.0,
        "cpu_total_jiffies": 2000,
        "cpu_idle_jiffies": 500,
        "cpu_steal_jiffies": 210,
    }
    d = proc_delta(before, after)
    assert d["steal_pct"] == 20.0  # (210-10)/(2000-1000)
    assert d["busy_pct"] == 70.0  # (1000-100-200)/1000
    assert d["loadavg_1m_after"] == 8.0
    # missing counters (non-Linux /proc) degrade to loadavg only
    assert "steal_pct" not in proc_delta({}, {})


def test_load_prev_full_picks_highest_round_numerically(tmp_path):
    """r9 must NOT beat r14 lexicographically ('r9' > 'r14')."""
    import json as _json

    from bench import load_prev_full

    for n, val in [(9, 1.0), (13, 2.0), (14, 3.0)]:
        (tmp_path / f"BENCH_FULL_r{n}.json").write_text(
            _json.dumps({"value": val})
        )
    name, doc = load_prev_full(str(tmp_path))
    assert name == "BENCH_FULL_r14.json" and doc["value"] == 3.0
    assert load_prev_full(str(tmp_path / "empty")) == (None, None)


def test_probe_stat_discards_warmup_and_takes_min():
    """Behavior contract (ADVICE r14 replaced the old source-substring
    pin): rep 0 is the codegen warm-up and never counts — even when it
    is the fastest raw timing — and the index is the MIN of the warm
    reps (steal is one-sided)."""
    from bench import probe_stat

    index, warm = probe_stat([8.7, 3.0, 2.9, 3.1, 5.0, 3.05])
    assert index == 2.9
    assert warm == [3.0, 2.9, 3.1, 5.0, 3.05]
    # a warm-up faster than every warm rep still must not win
    index, warm = probe_stat([0.1, 3.0, 3.2])
    assert index == 3.0 and warm == [3.0, 3.2]


def test_load_prev_full_skips_current_rounds_own_close_file(tmp_path):
    """ADVICE r14: after the round-N close file is committed, a rerun
    in round N must not self-compare. Current round = max
    CORRECTNESS_r* + 1; BENCH_FULL files at/past it are skipped."""
    import json as _json

    from bench import load_prev_full

    for n, val in [(13, 2.0), (14, 3.0), (15, 4.0)]:
        (tmp_path / f"BENCH_FULL_r{n}.json").write_text(
            _json.dumps({"value": val})
        )
    # artifacts say the last completed round is 14 -> current is 15
    for n in (13, 14):
        (tmp_path / f"CORRECTNESS_r{n}.json").write_text("{}")
    name, doc = load_prev_full(str(tmp_path))
    assert name == "BENCH_FULL_r14.json" and doc["value"] == 3.0
    # once round 15's CORRECTNESS lands, its bench becomes the baseline
    (tmp_path / "CORRECTNESS_r15.json").write_text("{}")
    name, doc = load_prev_full(str(tmp_path))
    assert name == "BENCH_FULL_r15.json" and doc["value"] == 4.0


def test_trace_median_index_shrugs_off_one_poisoned_probe():
    """r15 close-run lesson as a behavior pin: one steal-hit pass probe
    (19.9 s against ~2.1 s siblings) must not move the robust index,
    and short traces must decline to answer (fallback handled by the
    caller)."""
    from bench import trace_median_index

    trace = [
        {"probe_s": 19.9},
        {"probe_s": 2.46},
        {"probe_s": 1.98},
        {"probe_s": 2.10},
        {"probe_s": 2.13},
    ]
    assert trace_median_index(trace) == 2.13
    # zero/missing probes are dropped, not counted
    assert trace_median_index([{"probe_s": 0.0}, {}, {"probe_s": 2.0}]) is None
    assert trace_median_index([{"probe_s": 2.0}, {"probe_s": 2.2}]) is None


def test_median_drift_fallback_uses_prev_probe_rep_median_not_min():
    """r15 self-review: dividing a median-of-passes by the prev round's
    MIN-of-warm-reps machine_index inflates drift (r15 close: published
    1.651 vs corrected 1.295 against r14's rep median). The fallback
    chain must prefer prev machine_trace, then the median of prev probe
    warm reps, and only then the min-statistic machine_index."""
    import statistics

    from bench import trace_median_index, median

    prev_machine = {
        "machine_index": 1.613,  # min — must NOT be used when reps exist
        "machine_index_start_reps": [1.815, 1.739, 1.613, 2.536, 1.957],
        "machine_index_end_reps": [4.003, 2.575, 3.022, 2.157, 1.744],
    }
    # mirrors the bench.py fallback chain
    prev_reps = prev_machine["machine_index_start_reps"] + prev_machine[
        "machine_index_end_reps"
    ]
    prev_tm = (
        trace_median_index(prev_machine.get("machine_trace", []))
        or (median(prev_reps) if len(prev_reps) >= 3 else None)
        or prev_machine["machine_index"]
    )
    assert prev_tm == statistics.median(prev_reps) == 2.057
    # with a trace present, the trace wins
    prev_machine["machine_trace"] = [{"probe_s": x} for x in (2.0, 2.2, 2.4)]
    prev_tm = trace_median_index(prev_machine["machine_trace"]) or prev_tm
    assert prev_tm == 2.2


def test_shed_to_fit_keeps_gate_queries_and_core_keys():
    """r16 summary contract: the last stdout line must fit the driver's
    ~2000-char tail WITH the 50-entry gate-query map intact; the shed
    order sacrifices derivable keys first and never the map."""
    from bench import SUMMARY_SHED_ORDER, shed_to_fit
    import json

    queries = {f"query_name_number_{i:03d}": round(0.5 + i * 0.01, 2)
               for i in range(50)}
    summary = {
        "metric": "total_query_seconds",
        "value": 136.3,
        "value_plain_median": 141.9,
        "value_first_rep": 160.9,
        "value_cache_honest": 150.0,
        "unit": "sec",
        "sf": 0.1,
        "queries_n": 200,
        "queries": queries,
        "queries_scope": "first 50 registry entries (driver gate set)",
        "median_vs_r01": 0.67,
        "p90_vs_r01": 0.96,
        "median_vs_r01_trimmed": 0.6,
        "p90_vs_r01_trimmed": 0.9,
        "top5_slowest": {f"slow_query_{i}": 5.0 - i for i in range(5)},
        "first_vs_median_p90": 1.5,
        "incomplete": [],
        "noise": {"median_rep_spread": 1.1, "p90_rep_spread": 1.4,
                   "spread_def": "max/min over the stat's samples",
                   "median_rep_spread_raw": 1.6, "p90_rep_spread_raw": 3.2},
        "machine_index": 1.5,
        "machine_index_end": 1.6,
        "steal_pct": 0.3,
        "vs_prev_round": {"file": "BENCH_FULL_r15.json", "median": 1.0,
                           "p90": 1.1},
        "vs_prev_round_machine_normalized": {"median": 1.0, "p90": 1.1},
        "vs_prev_round_median_drift_normalized": {"drift": 1.1,
                                                   "median": 0.9, "p90": 1.0},
        "full": "BENCH_FULL_LATEST.json",
    }
    line = shed_to_fit(summary)
    assert len(line) <= 1900
    parsed = json.loads(line)
    # the per-query map always survives (values may drop to 1 decimal
    # only in the worst case, after every shed key is gone)
    assert set(parsed["queries"]) == set(queries)
    assert all(
        abs(parsed["queries"][n] - queries[n]) <= 0.051 for n in queries
    )
    for key in ("metric", "value", "value_first_rep", "value_cache_honest",
                 "unit", "sf", "median_vs_r01", "incomplete",
                 "machine_index", "vs_prev_round", "full"):
        assert key in parsed, key
    # shed keys are exactly a prefix of the declared order
    shed = [k for k in SUMMARY_SHED_ORDER if k not in parsed]
    assert shed == list(SUMMARY_SHED_ORDER[: len(shed)])
    # an already-small summary sheds nothing
    small = {"metric": "total_query_seconds", "value": 1.0,
             "noise": {"median_rep_spread": 1.1}}
    assert json.loads(shed_to_fit(dict(small))) == small


def test_cache_honest_total_swaps_family_rows_to_first_rep():
    from bench import cache_honest_total

    names = ["plain_a", "fam_b", "fam_c", "failed_d"]
    timings = {"plain_a": 1.0, "fam_b": 0.2, "fam_c": 0.3, "failed_d": -1.0}
    first = {"plain_a": 1.4, "fam_b": 2.0, "fam_c": 0.9}
    got = cache_honest_total(names, timings, first, {"fam_b", "fam_c"})
    # plain rows keep medians, family rows pay first_rep, failures drop
    assert got == round(1.0 + 2.0 + 0.9, 3)
