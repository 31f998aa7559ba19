"""Semantic pins for throttle_suppress (keyed cooldown dedup): the
greedy chain invariants the oracle hash alone doesn't spell out."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.timeseries import (
    THROTTLE_COOLDOWN_S,
    throttle_suppress,
)
from simple_map_reduce_ruuner_spark.sources.tables import load_table


def test_throttle_chain_invariants(spark, sf_dir):
    out = throttle_suppress(spark, sf_dir)
    rows = out.collect()
    assert rows

    # emissions per key are >= cooldown apart, in order
    by_key: dict[tuple, list] = {}
    for r in rows:
        by_key.setdefault((r.user_id, r.event_type), []).append(r.emit_ts)
    for ts_list in by_key.values():
        ts_sorted = sorted(ts_list)
        assert ts_list == ts_sorted
        for a, b in zip(ts_sorted, ts_sorted[1:]):
            assert (b - a).total_seconds() >= THROTTLE_COOLDOWN_S

    # every key's first event is emitted with its own event_id
    ev = load_table(spark, sf_dir, "events")
    firsts = {
        (r.user_id, r.event_type): (r.ts, r.event_id)
        for r in ev.groupBy("user_id", "event_type")
        .agg(
            F.min(F.struct("ts", "event_id")).alias("f")
        )
        .select("user_id", "event_type", "f.ts", "f.event_id")
        .collect()
    }
    emitted = {
        (r.user_id, r.event_type, r.emit_ts, r.first_event_id) for r in rows
    }
    for (u, t), (ts, eid) in firsts.items():
        assert (u, t, ts, eid) in emitted

    # conservation: emissions + suppressions account for every event
    total_events = ev.count()
    assert len(rows) + sum(r.n_suppressed for r in rows) == total_events


# --- randomized differential fuzz (r13 verdict item 6) ---------------
#
# The group-boundary-aware carry state (cur_key/pending/last_ns across
# Arrow batches) is the subtlest hand-rolled state machine in the repo;
# the fixture tests pin invariants on ONE dataset. This drives the
# kernel with hypothesis-generated (keys x cooldown x ts-jitter) inputs
# against the same recursive-CTE DuckDB oracle the registry uses, with
# Arrow batches forced tiny so groups STRADDLE batch boundaries.

import datetime

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simple_map_reduce_ruuner_spark.operators.timeseries import (
    throttle_of,
    throttle_oracle_sql,
)

# steps concentrate mass on the decision boundary: 0 (ties), exactly
# cooldown (the >= edge), one second either side, plus wide jitter
def _steps(cooldown):
    return st.lists(
        st.one_of(
            st.sampled_from([0, 1, cooldown - 1, cooldown, cooldown + 1]),
            st.integers(min_value=0, max_value=3 * cooldown),
        ),
        min_size=0,
        max_size=25,
    )


throttle_case = st.integers(min_value=1, max_value=7200).flatmap(
    lambda cd: st.tuples(
        st.just(cd),
        st.dictionaries(  # key -> inter-arrival steps
            st.tuples(
                st.integers(min_value=1, max_value=3),
                st.sampled_from(["click", "err"]),
            ),
            _steps(cd),
            min_size=1,
            max_size=4,
        ),
    )
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=throttle_case)
def test_throttle_fuzz_matches_recursive_cte_oracle(spark, case):
    cooldown, per_key = case
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for (uid, etype), steps in per_key.items():
        t = 0
        for s in [0] + steps:  # first event at base
            t += s
            rows.append(
                (uid, etype, base + datetime.timedelta(seconds=t), eid)
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_type", "ts", "event_id"]
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        df = spark.createDataFrame(
            rows,
            "user_id long, event_type string, ts timestamp_ntz, "
            "event_id long",
        )
        got = sorted(
            (r.user_id, r.event_type, r.emit_ts, r.first_event_id,
             r.n_suppressed)
            for r in throttle_of(df, cooldown).collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    con = duckdb.connect()
    con.register("fuzz_events", pdf)
    want = sorted(
        map(tuple, con.execute(
            throttle_oracle_sql(cooldown, table="fuzz_events")
        ).fetchall())
    )
    con.close()
    assert got == want
    # conservation: every input event is emitted or counted suppressed
    assert sum(r[4] + 1 for r in got) == len(rows)
