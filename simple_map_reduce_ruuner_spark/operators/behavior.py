"""Behavioral / product-analytics batch over the ``events`` stream
table: cohort retention, event-transition matrices, and time-weighted
averages — the workloads a user-analytics deployment of the reference
would script as custom reducers (the reference itself has no notion of
users or time; exampleCodes/finding_peek_numbers is its only temporal
workload, a per-second concurrency count).

Scale notes: all three queries ride ONE exchange of the events table on
``user_id`` (window functions compute per-user context in place — the
same decorrelation as relational7.small_quantity_order_revenue), then
aggregate to dimension-bounded outputs (|cohort-week × week|,
|event-type|², |user|). Nothing is collected to the driver; no self
joins.

Determinism-for-oracle notes:
- Week truncation uses ``date_trunc('week', ...)`` — ISO Monday in both
  Spark and DuckDB, and purely field-based on TIMESTAMP_NTZ (no session
  timezone involvement).
- Durations are exact MICROSECOND diffs (``timestampdiff`` is
  field-based on NTZ; DuckDB ``datediff('microsecond', ...)`` matches
  exactly at this precision).
- The time-weighted average is an all-integer computation floored to
  the cent (see its docstring) — no decimal→double cast of a
  >15-significant-digit total ever happens (those casts are correctly
  rounded in Spark but not in DuckDB).
- Transition ordering ties break on ``event_id`` (unique), making
  ``lead`` deterministic under equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_week, week_no, active_users): classic retention triangle —
    users bucketed by the week of their FIRST event, counted distinct in
    each subsequent week they appear.

    The per-user first-event timestamp is a window ``min`` over the
    ``user_id`` partition (no separate firsts aggregate + fact
    join-back), so the fact is exchanged once on user_id; the retention
    aggregate then groups |cohort×week| cells and the distinct count
    runs as the standard two-level rewrite.
    """
    return cohort_of(load_table(spark, sf_dir, "events"))


def cohort_of(ev: DataFrame) -> DataFrame:
    """DataFrame-level core of :func:`cohort_retention` (property-tested
    on generated event sets in tests/test_properties.py)."""
    ev = ev.select("user_id", "ts")
    w = Window.partitionBy("user_id")
    cohort = F.date_trunc("week", F.min("ts").over(w))
    week = F.date_trunc("week", F.col("ts"))
    return (
        ev.select(
            "user_id",
            cohort.alias("cohort_week"),
            (F.datediff(week, cohort) / 7).cast("long").alias("week_no"),
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
    )


COHORT_RETENTION_SQL = """
WITH tagged AS (
    SELECT user_id,
           date_trunc('week', min(ts) OVER (PARTITION BY user_id))
               AS cohort_week,
           date_trunc('week', ts) AS event_week
    FROM events
)
SELECT cohort_week,
       CAST(datediff('day', cohort_week, event_week) // 7 AS BIGINT)
           AS week_no,
       CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
FROM tagged
GROUP BY 1, 2
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, transitions): per-user event-type bigram
    counts — the Markov transition matrix of the product funnel.

    ``lead`` over (user_id | ts, event_id) pairs each event with its
    successor in one exchange; terminal events (lead = NULL) drop out;
    the |event-type|² aggregate is map-side-combinable.
    """
    return transitions_of(load_table(spark, sf_dir, "events"))


def transitions_of(ev: DataFrame) -> DataFrame:
    """DataFrame-level core of :func:`event_transitions`."""
    ev = ev.select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paired = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    return paired.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("transitions")
    )


EVENT_TRANSITIONS_SQL = """
WITH paired AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS to_type
    FROM events
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS transitions
FROM paired
WHERE to_type IS NOT NULL
GROUP BY 1, 2
"""


def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, twa_value): per-user time-weighted average of ``value``
    — each reading weighted by how long it remained current (until the
    user's next event). The hypertable/financial "time_weight" aggregate
    (TWAP), which a plain AVG gets wrong whenever sampling is irregular.

    Single-event users have no weighted interval and drop out (matching
    the oracle). Exactness contract: the result is the TWAP floored to
    the cent. value is exactly 2-decimal, so ``value × 100`` through a
    DECIMAL cast is an exact BIGINT of cents; cents × dt_us sums in
    DECIMAL(38,0) (a first cut summed value-decimals directly and cast
    the 17-significant-digit total to double — correctly rounded in
    Spark's BigDecimal path but not in DuckDB's, a measured last-ulp
    mismatch on every user); the cent-µs total integer-divides by the
    µs total (all non-negative, so trunc ≡ floor on both engines), and
    only the exact integer cents ever touch floating point.
    """
    return twa_of(load_table(spark, sf_dir, "events"))


def twa_of(ev: DataFrame) -> DataFrame:
    """DataFrame-level core of :func:`time_weighted_value`.

    Zero-duration spans (equal consecutive timestamps) carry no weight
    and are filtered BEFORE aggregation — a user whose events all share
    one timestamp would otherwise reach ``sum(dt_us) = 0`` and raise
    DIVIDE_BY_ZERO under ANSI mode (hypothesis-found; such users drop
    out exactly like single-event users).
    """
    ev = ev.select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_us = F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    # the cents × µs product MUST multiply in DECIMAL, not int64: a
    # ~$35k value held for ~30 days already exceeds 2^63 µs-cents and
    # would raise ARITHMETIC_OVERFLOW under ANSI (the oracle multiplies
    # in HUGEINT and would silently keep going — an asymmetric crash)
    weighted = (
        ev.withColumn("next_ts", F.lead("ts").over(w))
        .where(dt_us > 0)
        .select(
            "user_id",
            (cents.cast("decimal(38,0)") * dt_us).alias("cents_dt"),
            dt_us.alias("dt_us"),
        )
    )
    return weighted.groupBy("user_id").agg(
        F.expr(
            "CAST(CAST(sum(cents_dt) div sum(dt_us) AS BIGINT) AS DOUBLE)"
            " / 100.0"
        ).alias("twa_value")
    )


TIME_WEIGHTED_VALUE_SQL = """
WITH spans AS (
    SELECT user_id,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           datediff('microsecond', ts,
                    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS dt_us
    FROM events
)
SELECT user_id,
       CAST(sum(CAST(cents AS HUGEINT) * dt_us) // sum(dt_us) AS DOUBLE)
           / 100.0 AS twa_value
FROM spans
WHERE dt_us > 0
GROUP BY user_id
"""


QUERIES: dict[str, Query] = {
    "cohort_retention": Query(
        cohort_retention,
        COHORT_RETENTION_SQL,
        "retention triangle: first-event cohort × active week",
    ),
    "event_transitions": Query(
        event_transitions,
        EVENT_TRANSITIONS_SQL,
        "per-user event-type bigram (Markov transition) counts",
    ),
    "time_weighted_value": Query(
        time_weighted_value,
        TIME_WEIGHTED_VALUE_SQL,
        "per-user TWAP: interval-weighted mean over irregular samples",
    ),
}


def nation_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, o_year, revenue, yoy_ppm): per-nation yearly customer
    revenue with year-over-year growth in exact parts-per-million —
    the lag-ratio trend pattern (growth dashboards, seasonality
    screens) the windowed family otherwise lacks.

    Exactness: yearly revenue sums to exact BIGINT cents; growth
    (rev − prev) × 10⁶ div prev then runs on INTEGER operands with one
    truncating division — Spark in DECIMAL(38,0) (where ``div`` is the
    integral-divide), DuckDB in HUGEINT (``sum(BIGINT)`` widens there).
    The integer operands are load-bearing: DuckDB's ``//`` only
    truncates on INTEGER types — on DECIMAL operands it is plain
    division (DECIMAL −7 // 2 returns −3.5, advice r6) — so the oracle
    must never let these operands become DECIMAL. The numerator
    (rev − prev) IS negative in shrinking years, so sign-agreement is
    NOT what makes the engines match — Spark ``div`` and DuckDB integer
    ``//`` both truncate toward zero (not floor), so negative quotients
    round identically (−7÷2 → −3 in both). Do not swap either side for
    a floor division. First year per nation emits NULL. One fact pass: orders ⋈ broadcast(customer⋈nation), grouped
    to |nation|×|year| rows; the lag window rides the tiny aggregate.
    """
    from simple_map_reduce_ruuner_spark.sources.tables import load_table as _lt

    orders = _lt(spark, sf_dir, "orders")
    customer = _lt(spark, sf_dir, "customer")
    nation = _lt(spark, sf_dir, "nation")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    cust_nation = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    yearly = (
        orders.join(F.broadcast(cust_nation), orders.o_custkey == F.col("c_custkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    return (
        yearly.withColumn("prev_cents", F.lag("rev_cents").over(w))
        .select(
            "n_name",
            "o_year",
            (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
            F.expr(
                "CAST((rev_cents - prev_cents) * CAST(1000000 AS DECIMAL(38,0))"
                " div nullif(prev_cents, 0) AS BIGINT)"
            ).alias("yoy_ppm"),
        )
    )


NATION_YOY_GROWTH_SQL = """
WITH yearly AS (
    SELECT n_name,
           CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS rev_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
)
SELECT n_name, o_year,
       CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
       CAST((rev_cents - lag(rev_cents) OVER w) * CAST(1000000 AS HUGEINT)
            // nullif(lag(rev_cents) OVER w, 0) AS BIGINT) AS yoy_ppm
FROM yearly
WINDOW w AS (PARTITION BY n_name ORDER BY o_year)
"""


QUERIES["nation_yoy_growth"] = Query(
    nation_yoy_growth,
    NATION_YOY_GROWTH_SQL,
    "per-nation yearly revenue with exact-ppm year-over-year growth",
)


def session_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t1, t2, t3, n_paths, rank): within-session event-type trigram
    census — the path-mining extension of ``event_transitions``' bigram
    matrix, with the session boundary enforced (a re-entry after more
    than SESSION_GAP_SECONDS — the suite-wide 4 h gap from
    streaming/windows.py — must not fabricate a path across sessions;
    the transition matrix deliberately ignores that boundary, this
    query is the sessionized complement).

    One exchange, one sort: sessionization (running sum of gap flags,
    the ``sessionize_events`` idiom) and both lookaheads share the same
    (user_id | ts, event_id) window. Instead of re-partitioning by
    (user, session), the trigram keeps a row only when
    ``lead(session_seq, 2)`` still equals the row's own session —
    session_seq is non-decreasing within a user, so the third event
    sharing the session implies the second does too.

    Output is |event_type|³-bounded (125 rows here), so the rank runs
    as a single-partition window over the aggregate — bounded by the
    type alphabet, never by events — under the total order
    (n_paths DESC, t1, t2, t3): deterministic in both engines with no
    tie hazard.
    """
    from simple_map_reduce_ruuner_spark.streaming.windows import (
        SESSION_GAP_SECONDS,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_sec = F.timestamp_diff("SECOND", prev_ts, F.col("ts"))
    is_new = F.when(
        prev_ts.isNull() | (gap_sec > SESSION_GAP_SECONDS), 1
    ).otherwise(0)
    sess = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    tri = (
        ev.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
            sess.alias("s1"),
            F.lead(sess, 2).over(w).alias("s3"),
        )
        .where(F.col("s3") == F.col("s1"))
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )
    w_rank = Window.orderBy(
        F.desc("n_paths"), F.asc("t1"), F.asc("t2"), F.asc("t3")
    )
    return tri.select(
        "t1", "t2", "t3", "n_paths",
        F.row_number().over(w_rank).cast("long").alias("rank"),
    )


def _session_trigrams_sql() -> str:
    from simple_map_reduce_ruuner_spark.streaming.windows import (
        SESSION_GAP_SECONDS,
    )

    return f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR date_diff('second', lag(ts) OVER w, ts)
                        > {SESSION_GAP_SECONDS}
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessed AS (
    SELECT user_id, ts, event_id, event_type,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS s1
    FROM flagged
),
tri AS (
    SELECT event_type AS t1,
           lead(event_type, 1) OVER w AS t2,
           lead(event_type, 2) OVER w AS t3,
           s1,
           lead(s1, 2) OVER w AS s3
    FROM sessed
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
agg AS (
    SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_paths
    FROM tri WHERE s3 = s1
    GROUP BY 1, 2, 3
)
SELECT t1, t2, t3, n_paths,
       CAST(row_number() OVER (ORDER BY n_paths DESC, t1, t2, t3)
            AS BIGINT) AS rank
FROM agg
"""


SESSION_TRIGRAMS_SQL = _session_trigrams_sql()

QUERIES["session_trigrams"] = Query(
    session_trigrams,
    SESSION_TRIGRAMS_SQL,
    "within-session event-type trigram paths: one user-keyed exchange, "
    "session guard via lead(session_seq, 2), type-alphabet-bounded rank",
)
