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
