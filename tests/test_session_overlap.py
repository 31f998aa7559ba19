"""Tie semantics of the merged-sweep interval-overlap counter.

The counting identity overlaps(s) = #{starts < s.end} − #{ends ≤
s.start} − 1 lives or dies on its boundary rules: a session starting at
the exact instant another ends must NOT count (half-open intervals),
and a brute-force pairwise check over handcrafted sessions is the only
honest referee, since the production oracle (DuckDB IEJoin) shares the
predicate but not the sweep."""

from __future__ import annotations

import datetime as dt
import glob
import shutil

import pytest
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.timeseries import (
    session_overlap_counts,
)
from simple_map_reduce_ruuner_spark.streaming.windows import (
    SESSION_GAP_SECONDS,
    session_windows,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _mk_events(spark, out_dir, rows):
    """rows: (event_id, user_id, seconds-offset). Writes a single-file
    events.parquet shaped like the driver's."""
    data = [
        (eid, T0 + dt.timedelta(seconds=off), uid, "click", 1.0, "{}")
        for eid, uid, off in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = str(out_dir / "_events_dir")
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, str(out_dir / "events.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)
    return str(out_dir)


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("overlap_sf")
    gap = SESSION_GAP_SECONDS
    rows = [
        # user 1: single event at 0 → session [0, gap)
        (1, 1, 0),
        # user 2: single event exactly at user 1's session END → sessions
        # touch at one instant; half-open ⇒ NOT overlapping
        (2, 2, gap),
        # user 3: event inside user 1's session → overlaps 1, and its
        # session [10, 10+gap) also overlaps user 2's [gap, 2*gap)
        (3, 3, 10),
        # user 4: far away → overlaps nobody
        (4, 4, 10 * gap),
        # user 1 again much later: second session for the same user,
        # overlapping user 4's session
        (5, 1, 10 * gap + 5),
    ]
    return _mk_events(spark, out, rows)


def test_overlap_counts_match_bruteforce(spark, crafted_sf):
    got = {
        (r["user_id"], r["session_start"]): r["n_overlapping"]
        for r in session_overlap_counts(spark, crafted_sf).collect()
    }
    sessions = session_windows(spark, crafted_sf).collect()
    assert len(sessions) == 5
    want = {}
    for s in sessions:
        n = sum(
            1
            for t in sessions
            if (t["user_id"], t["session_start"])
            != (s["user_id"], s["session_start"])
            and t["session_start"] < s["session_end"]
            and t["session_end"] > s["session_start"]
        )
        want[(s["user_id"], s["session_start"])] = n
    assert got == want


def test_touching_sessions_do_not_overlap(spark, crafted_sf):
    rows = session_overlap_counts(spark, crafted_sf).collect()
    by_user_start = {
        (r["user_id"], r["session_start"]): r["n_overlapping"] for r in rows
    }
    gap = dt.timedelta(seconds=SESSION_GAP_SECONDS)
    # user 1 session 1 overlaps only user 3 (not user 2, which merely touches)
    assert by_user_start[(1, T0)] == 1
    # user 2 overlaps only user 3
    assert by_user_start[(2, T0 + gap)] == 1
    # user 3 overlaps users 1 and 2
    assert by_user_start[(3, T0 + dt.timedelta(seconds=10))] == 2
    # user 4 overlaps user 1's second session only
    assert (
        by_user_start[(4, T0 + dt.timedelta(seconds=10 * SESSION_GAP_SECONDS))]
        == 1
    )
