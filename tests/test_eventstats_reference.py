"""Independent pure-Python references for the session-2 event
analytics. The DuckDB oracle proves cross-engine parity; these prove
the ALGEBRA against a from-first-principles reimplementation (arbitrary
precision ints, stdlib statistics) — a shared misreading of the
statistic in both SQL dialects would slip the parity gate but not this.
"""

from __future__ import annotations

import statistics
from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def _events():
    """(event_id, ts, user_id, event_type, cents) rows, via duckdb so
    the reference shares nothing with the Spark path."""
    rows = duckdb.sql(
        f"""SELECT event_id, ts, user_id, event_type,
                   CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    return rows


def test_cusum_changepoint_matches_bigint_reference(spark):
    from simple_map_reduce_ruuner_spark.operators.timeseries import (
        cusum_changepoint,
    )

    series = defaultdict(list)
    for eid, ts, _uid, et, cents in _events():
        series[et].append((ts, eid, int(cents)))
    expected = {}
    for et, rows in series.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        ys = [c for _, _, c in rows]
        n = len(ys)
        s_n = sum(ys)
        gross = sum(abs(y) for y in ys)
        best, cp = -1, None
        s_k = 0
        for k, y in enumerate(ys, start=1):
            s_k += y
            d = abs(n * s_k - k * s_n)
            if d > best:
                best, cp = d, k
        expected[et] = {
            "n": n,
            "cp_pos": cp,
            "cp_frac_milli": cp * 1000 // n,
            "dev_ppm": (best * 10**6 // (n * gross)) if n * gross > 0 else None,
        }

    got = {r["event_type"]: r for r in cusum_changepoint(spark, SF).collect()}
    assert set(got) == set(expected)
    for et, exp in expected.items():
        for col, val in exp.items():
            assert got[et][col] == val, (et, col, got[et][col], val)


def test_mad_outliers_matches_integer_reference(spark):
    from simple_map_reduce_ruuner_spark.operators.curation import mad_outliers

    groups = defaultdict(list)
    for _eid, _ts, _uid, et, cents in _events():
        groups[et].append(2 * int(cents))
    expected = {}
    for et, x2s in groups.items():
        m2 = int(statistics.median(x2s))  # midpoint of evens: exact int
        dev2 = [2 * abs(x - m2) for x in x2s]
        mad4 = int(statistics.median(dev2))
        n_out = sum(1 for d in dev2 if 2 * d > 7 * mad4)
        expected[et] = {
            "n": len(x2s),
            "median_milli": m2 * 5,
            "mad_e4": mad4 * 25,
            "n_outliers": n_out,
            "outlier_ppm": n_out * 10**6 // len(x2s),
        }

    got = {r["event_type"]: r for r in mad_outliers(spark, SF).collect()}
    assert set(got) == set(expected)
    for et, exp in expected.items():
        for col, val in exp.items():
            assert got[et][col] == val, (et, col, got[et][col], val)


def test_session_trigrams_matches_pure_python_sessionizer(spark):
    from simple_map_reduce_ruuner_spark.operators.behavior import (
        session_trigrams,
    )
    from simple_map_reduce_ruuner_spark.streaming.windows import (
        SESSION_GAP_SECONDS,
    )

    per_user = defaultdict(list)
    for eid, ts, uid, et, _c in _events():
        per_user[uid].append((ts, eid, et))
    counts = Counter()
    for rows in per_user.values():
        rows.sort(key=lambda r: (r[0], r[1]))
        sessions, cur, prev_ts = [], [], None
        for ts, _eid, et in rows:
            if prev_ts is not None and (
                (ts - prev_ts).total_seconds() > SESSION_GAP_SECONDS
            ):
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev_ts = ts
        sessions.append(cur)
        for sess in sessions:
            for i in range(len(sess) - 2):
                counts[(sess[i], sess[i + 1], sess[i + 2])] += 1

    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = {
        tri: (cnt, rank)
        for rank, (tri, cnt) in enumerate(ranked, start=1)
    }
    got = {
        (r["t1"], r["t2"], r["t3"]): (r["n_paths"], r["rank"])
        for r in session_trigrams(spark, SF).collect()
    }
    assert got == expected
