"""Property-based differential tests (hypothesis).

The fixed-fixture oracle checks prove parity on one dataset; these prove
the algebraic claims on arbitrary inputs:

1. sweep-line peak concurrency ≡ explode formulation on random interval
   sets (the gap-merge + running-sum rewrite is the subtlest algorithm
   in the repo — overlap dedup, adjacent-interval merging, tie handling).
2. word_count ≡ pure-Python counting on random whitespace-y strings.

Example counts are small: each example runs Spark jobs.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

interval = st.tuples(
    st.sampled_from(["a", "b"]),          # op
    st.integers(min_value=0, max_value=5),  # number (small pool → overlaps)
    st.integers(min_value=0, max_value=50),  # start
    st.integers(min_value=0, max_value=20),  # length
)


def _sweep(df):
    """Mirror of peaks.peak_concurrency_sweep's core on an interval df."""
    w_order = Window.partitionBy("op", "number").orderBy("start_sec", "end_sec")
    prev_max_end = F.max("end_sec").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = df.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("start_sec") > prev_max_end + 1), 1
        ).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w_order))
    merged = islands.groupBy("op", "number", "island").agg(
        F.min("start_sec").alias("start_sec"), F.max("end_sec").alias("end_sec")
    )
    deltas = merged.select(
        "op", F.col("start_sec").alias("sec"), F.lit(1).alias("delta")
    ).unionAll(
        merged.select("op", (F.col("end_sec") + 1).alias("sec"), F.lit(-1).alias("delta"))
    )
    per_sec = deltas.groupBy("op", "sec").agg(F.sum("delta").alias("delta"))
    running = per_sec.withColumn(
        "cnt", F.sum("delta").over(Window.partitionBy("op").orderBy("sec"))
    )
    return running.groupBy("op").agg(F.max("cnt").cast("long").alias("peak"))


def _explode(df):
    per_sec = (
        df.select(
            "op", "number", F.explode(F.sequence("start_sec", "end_sec")).alias("sec")
        )
        .groupBy("op", "sec")
        .agg(F.countDistinct("number").alias("cnt"))
    )
    return per_sec.groupBy("op").agg(F.max("cnt").alias("peak"))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(interval, min_size=1, max_size=25))
def test_sweep_equals_explode_on_random_intervals(spark, ivs):
    rows = [(op, n, s, s + ln) for op, n, s, ln in ivs]
    df = spark.createDataFrame(
        rows, "op string, number int, start_sec int, end_sec int"
    )
    sweep = {(r.op, r.peak) for r in _sweep(df).collect()}
    explode = {(r.op, r.peak) for r in _explode(df).collect()}
    assert sweep == explode


text_line = st.text(
    alphabet=st.sampled_from("ab \t"), min_size=0, max_size=30
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(text_line, min_size=1, max_size=20))
def test_word_count_matches_python(spark, lines):
    from simple_map_reduce_ruuner_spark.operators.wordcount import word_count_df

    df = spark.createDataFrame([(l,) for l in lines], "text string")
    got = {(r.word, r.cnt) for r in word_count_df(df).collect()}
    expected = Counter(
        tok for l in lines for tok in l.lower().split() if tok
    )
    assert got == set(expected.items())


def test_peaks_negative_duration_clamps_to_point_interval(spark, tmp_path):
    """A negative events.value must clamp to a 1-second interval in EVERY
    formulation (Spark explode, Spark sweep, DuckDB oracle) — without the
    greatest() clamp, Spark's sequence() emits a descending range while
    generate_series returns empty: silent three-way divergence."""
    import duckdb

    from simple_map_reduce_ruuner_spark.operators.peaks import (
        PEAK_CONCURRENCY_SQL,
        peak_concurrency_explode,
        peak_concurrency_sweep,
    )

    rows = [
        (1, "2024-01-01 00:00:10", 101, "a", -50.0, "{}"),
        (2, "2024-01-01 00:00:10", 102, "a", 5.0, "{}"),
        (3, "2024-01-01 00:00:20", 103, "b", -1.0, "{}"),
    ]
    df = (
        spark.createDataFrame(
            rows,
            "event_id long, ts_s string, user_id long, event_type string,"
            " value double, props string",
        )
        .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")

    expected = {("a", 2), ("b", 1)}  # both "a" intervals cover sec 10
    got_explode = {
        (r.op, r.peak) for r in peak_concurrency_explode(spark, sf_dir).collect()
    }
    got_sweep = {
        (r.op, r.peak) for r in peak_concurrency_sweep(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    got_oracle = {(op, peak) for op, peak in con.execute(PEAK_CONCURRENCY_SQL).fetchall()}
    assert got_explode == expected
    assert got_sweep == expected
    assert got_oracle == expected


def test_minhash_lsh_recall_meets_band_curve(spark, tmp_path):
    """The banded-LSH recall claim, tested statistically: for a pair with
    true shingle Jaccard j, P(LSH candidate) = 1-(1-j^4)^4 at 16 perms /
    4 bands of 4 rows (dedup.py band parameters). Plant near-dup pairs
    across the j spectrum, measure which the LSH catches, and assert the
    caught count is within 3 sigma of the theoretical expectation (lower
    bound — the claim under test is recall, not precision)."""
    import math
    import random as rnd

    from simple_map_reduce_ruuner_spark.operators.dedup import (
        neardup_jaccard,
        neardup_minhash_lsh,
    )

    rng = rnd.Random(29)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    doc_id = 0
    for base in range(30):
        words = [rng.choice(vocab) for _ in range(60)]
        rows.append((doc_id, " ".join(words)))
        doc_id += 1
        # dup with a replacement fraction sweeping the jaccard spectrum
        frac = 0.02 + 0.7 * (base / 29)
        dup = [w if rng.random() > frac else rng.choice(vocab) for w in words]
        rows.append((doc_id, " ".join(dup)))
        doc_id += 1
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in neardup_jaccard(spark, sf_dir).collect()
    }
    assert len(exact) >= 10  # planting must produce a real sample
    cand = {
        (r.doc_a, r.doc_b) for r in neardup_minhash_lsh(spark, sf_dir).collect()
    }

    def p_candidate(j: float) -> float:
        return 1.0 - (1.0 - j**4) ** 4

    caught = sum(1 for pair in exact if pair in cand)
    expect = sum(p_candidate(j) for j in exact.values())
    var = sum(p_candidate(j) * (1 - p_candidate(j)) for j in exact.values())
    assert caught >= expect - 3 * math.sqrt(var) - 1, (caught, expect, var)


def test_lsh_pipeline_correct_under_hot_bucket_skew(spark, tmp_path):
    """Skewed corpus: one LSH bucket holds 150 identical documents (the
    classic boilerplate/hot-shingle case). The production pipeline must
    stay correct: every identical pair found with jaccard 1.0, exact
    dedup collapsing them to one canonical row, clusters mapping all
    copies to the min doc_id."""
    from simple_map_reduce_ruuner_spark.operators.dedup import (
        exact_dedup,
        neardup_clusters,
        neardup_lsh_verified,
    )

    boiler = "terms of service apply to all users of this web site today"
    rows = [(i, boiler) for i in range(150)]
    # distinct background docs (unique token streams, no shared shingles)
    rows += [
        (1000 + i, " ".join(f"tok{1000 + i}_{j}" for j in range(12)))
        for i in range(100)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    pairs = neardup_lsh_verified(spark, sf_dir)
    n_identical = 150 * 149 // 2
    got = pairs.collect()
    assert len(got) == n_identical
    assert all(r.jaccard == 1.0 for r in got)

    dedup_rows = exact_dedup(spark, sf_dir).collect()
    boiler_groups = [r for r in dedup_rows if r.n_copies == 150]
    assert len(boiler_groups) == 1
    assert boiler_groups[0].keep_doc_id == 0

    clusters = {
        r.doc_id: r.cluster_id for r in neardup_clusters(spark, sf_dir).collect()
    }
    assert all(clusters[i] == 0 for i in range(150))
    assert all(clusters[1000 + i] == 1000 + i for i in range(100))


def test_sessionize_invariants(spark, sf_dir):
    """Within a user: consecutive events share a session iff the gap is
    <= the session gap; session_seq is non-decreasing and starts at 1."""
    from simple_map_reduce_ruuner_spark.operators.timeseries import (
        SESSION_GAP_SECONDS,
        sessionize_events,
    )

    rows = sessionize_events(spark, sf_dir).toPandas()
    rows = rows.sort_values(["user_id", "ts", "event_id"])
    for _, g in rows.groupby("user_id"):
        seqs = g["session_seq"].tolist()
        assert seqs[0] == 1
        gaps = g["ts"].diff().dt.total_seconds().tolist()[1:]
        for (prev, cur), gap in zip(zip(seqs, seqs[1:]), gaps):
            if gap > SESSION_GAP_SECONDS:
                assert cur == prev + 1, (prev, cur, gap)
            else:
                assert cur == prev, (prev, cur, gap)


def test_pagerank_invariants(spark, sf_dir):
    """Fixed-point PageRank: every rank positive and at least the
    teleport floor; total mass <= 1 and within truncation loss of 1
    (each div truncates < 1 femto per node/edge)."""
    from simple_map_reduce_ruuner_spark.operators.graph import (
        SCALE_FEMTO,
        pagerank_trading,
    )

    rows = pagerank_trading(spark, sf_dir).toPandas()
    n = len(rows)
    n_edges = int(rows["degree"].sum())
    floor = (15 * SCALE_FEMTO) // (100 * n)
    assert (rows["rank_femto"] >= floor).all()
    total = int(rows["rank_femto"].sum())
    # truncation: <=1 femto per edge contribution + per-node damping div,
    # compounded over 5 iterations
    max_loss = 5 * (n_edges + 2 * n)
    assert SCALE_FEMTO - max_loss <= total <= SCALE_FEMTO


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # custkey (small pool → overlap)
            st.integers(min_value=0, max_value=30),  # day offset
            st.integers(min_value=0, max_value=86399),  # seconds within day
        ),
        min_size=0,
        max_size=25,
    )
)
def test_bucketed_interval_join_equals_naive(spark, orders):
    """order_followups_week's day-bucket rewrite must be EXACTLY the
    naive non-equi join on arbitrary timestamps — including intervals
    straddling day boundaries and same-timestamp orders (the bucket
    trick changes the plan, never the result set)."""
    from simple_map_reduce_ruuner_spark.operators.relational5 import WINDOW_DAYS

    rows = [
        (
            i,
            cust,
            f"timestamp'2020-01-01 00:00:00' + INTERVAL {day} DAYS"
            f" + INTERVAL {sec} SECONDS",
        )
        for i, (cust, day, sec) in enumerate(orders)
    ]
    if not rows:
        return
    sel = ", ".join(
        f"({k}L, {c}L, CAST({ts_expr} AS TIMESTAMP_NTZ))" for k, c, ts_expr in rows
    )
    df = spark.sql(
        f"SELECT * FROM VALUES {sel} AS t(o_orderkey, o_custkey, o_orderdate)"
    ).withColumn("o_totalprice", F.col("o_orderkey").cast("double"))

    windows = df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.explode(
            F.expr(
                "sequence(date_trunc('DAY', o_orderdate),"
                f" date_trunc('DAY', o_orderdate + INTERVAL {WINDOW_DAYS} DAYS),"
                " INTERVAL 1 DAY)"
            )
        ).alias("day"),
    )
    points = df.select(
        F.col("o_orderkey").alias("f_orderkey"),
        F.col("o_custkey").alias("f_custkey"),
        F.col("o_orderdate").alias("f_orderdate"),
        F.date_trunc("DAY", F.col("o_orderdate")).alias("day"),
    )
    bucketed = (
        windows.join(
            points,
            on=[windows.o_custkey == points.f_custkey, windows.day == points.day],
        )
        .where(
            (F.col("f_orderdate") >= F.col("o_orderdate"))
            & (
                F.col("f_orderdate")
                < F.col("o_orderdate") + F.expr(f"INTERVAL {WINDOW_DAYS} DAYS")
            )
            & (F.col("f_orderkey") != F.col("o_orderkey"))
        )
        .select("o_orderkey", "f_orderkey")
    )
    a = df.select("o_orderkey", "o_custkey", "o_orderdate")
    b = df.select(
        F.col("o_orderkey").alias("f_orderkey"),
        F.col("o_custkey").alias("f_custkey"),
        F.col("o_orderdate").alias("f_orderdate"),
    )
    naive = a.join(
        b,
        (a.o_custkey == b.f_custkey)
        & (b.f_orderdate >= a.o_orderdate)
        & (b.f_orderdate < a.o_orderdate + F.expr(f"INTERVAL {WINDOW_DAYS} DAYS"))
        & (b.f_orderkey != a.o_orderkey),
    ).select("o_orderkey", "f_orderkey")
    got = sorted(map(tuple, bucketed.collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want


def test_shared_span_finds_known_substring(spark, tmp_path):
    """Two documents sharing exactly one verbatim 8-token run (and
    enough other overlap to be LSH candidates) must report
    lcs_tokens == 8; an unrelated doc must not pair with them."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    d1 = shared + " xray yankee zulu one two three"
    d2 = "nine eight " + shared + " seven six five four"
    d3 = "completely different words entirely unrelated content here okay"
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, d1, "en", "s", len(d1)), (2, d2, "en", "s", len(d2)),
         (3, d3, "en", "s", len(d3))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    from simple_map_reduce_ruuner_spark.operators.dedup import (
        SHINGLE_K,
        neardup_shared_span,
    )

    rows = {(r.doc_a, r.doc_b): r for r in neardup_shared_span(spark, sf_dir).collect()}
    assert all(k == (1, 2) for k in rows), rows
    if (1, 2) in rows:  # pair is an LSH candidate with these planted dups
        r = rows[(1, 2)]
        # 8 shared tokens -> 8 - K + 1 aligned shingles -> lcs = 8
        assert r.max_run == 8 - SHINGLE_K + 1
        assert r.lcs_tokens == 8


event_row = st.tuples(
    st.integers(min_value=0, max_value=2),   # user pool (small → long streams)
    st.sampled_from(["click", "view", "err"]),
    st.integers(min_value=0, max_value=5),   # ts seconds pool (small → ties)
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(event_row, min_size=1, max_size=30))
def test_user_type_islands_equals_bruteforce(spark, tmp_path_factory, evs):
    """Gaps-and-islands run collapse ≡ a per-user linear walk, including
    equal-timestamp ties (broken by event_id, mirrored in both)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=sec), u, typ, 0.0, "{}")
        for i, (u, typ, sec) in enumerate(evs)
    ]
    sf_dir = str(tmp_path_factory.mktemp("islands_sf"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    from simple_map_reduce_ruuner_spark.operators.profiling import (
        user_type_islands,
    )

    got = {
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.n_events)
        for r in user_type_islands(spark, sf_dir).collect()
    }

    want = set()
    by_user: dict[int, list] = {}
    for eid, ts, u, typ, _, _ in rows:
        by_user.setdefault(u, []).append((ts, eid, typ))
    for u, stream in by_user.items():
        stream.sort()  # (ts, event_id) — the operator's sort key
        run_type, run_from, run_to, n = None, None, None, 0
        for ts, _, typ in stream:
            if typ == run_type:
                run_to, n = ts, n + 1
            else:
                if run_type is not None:
                    want.add((u, run_type, run_from, run_to, n))
                run_type, run_from, run_to, n = typ, ts, ts, 1
        want.add((u, run_type, run_from, run_to, n))

    assert got == want


# --- behavioral analytics vs pure-Python reimplementation ----------------

_event = st.tuples(
    st.integers(min_value=0, max_value=3),            # user_id (small pool)
    st.integers(min_value=0, max_value=3_000_000),    # µs offset from epoch0
    st.sampled_from(["a", "b", "c"]),                 # event_type
    st.integers(min_value=0, max_value=9999),         # value in cents
)


def _event_df(spark, events):
    import datetime

    epoch0 = datetime.datetime(2024, 1, 1)
    rows = [
        (
            u,
            epoch0 + datetime.timedelta(microseconds=us),
            i,  # unique event_id = generation index
            t,
            cents / 100.0,
        )
        for i, (u, us, t, cents) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string, value double"
    )


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_event, min_size=2, max_size=25))
def test_event_transitions_match_python(spark, events):
    from simple_map_reduce_ruuner_spark.operators.behavior import transitions_of

    got = {
        (r.from_type, r.to_type): r.transitions
        for r in transitions_of(_event_df(spark, events)).collect()
    }
    per_user: dict[int, list] = {}
    for i, (u, us, t, _c) in enumerate(events):
        per_user.setdefault(u, []).append((us, i, t))
    expected = Counter()
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            expected[(a, b)] += 1
    assert got == dict(expected)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_event, min_size=2, max_size=25))
def test_twa_matches_python_bigint(spark, events):
    from simple_map_reduce_ruuner_spark.operators.behavior import twa_of

    got = {
        r.user_id: r.twa_value
        for r in twa_of(_event_df(spark, events)).collect()
    }
    per_user: dict[int, list] = {}
    for i, (u, us, t, cents) in enumerate(events):
        per_user.setdefault(u, []).append((us, i, cents))
    expected = {}
    for u, seq in per_user.items():
        seq.sort()
        num = den = 0
        for (us0, _, cents), (us1, _, _) in zip(seq, seq[1:]):
            dt = us1 - us0
            num += cents * dt
            den += dt
        if den > 0:
            expected[u] = (num // den) / 100.0
    # all-zero-duration users drop out in both implementations (the
    # dt_us > 0 filter — its absence was a hypothesis-found ANSI
    # DIVIDE_BY_ZERO crash)
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_event, min_size=1, max_size=25))
def test_cohort_retention_invariants(spark, events):
    from simple_map_reduce_ruuner_spark.operators.behavior import cohort_of

    rows = cohort_of(_event_df(spark, events)).collect()
    users = {u for (u, *_rest) in events}
    # week 0 of each cohort contains every user of that cohort exactly once
    week0 = {r.cohort_week: r.active_users for r in rows if r.week_no == 0}
    assert sum(week0.values()) == len(users)
    # no cell can exceed its cohort's size, and week_no is never negative
    for r in rows:
        assert 0 <= r.week_no
        assert r.active_users <= week0[r.cohort_week]


_cust_row = st.tuples(
    st.integers(min_value=0, max_value=9),     # o_custkey
    st.integers(min_value=0, max_value=500),   # spend_cents
    st.integers(min_value=1, max_value=9),     # n_orders
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_cust_row, min_size=2, max_size=12, unique_by=lambda r: r[0]))
def test_spearman_and_gini_match_python(spark, custs):
    """Rank statistics vs pure-Python on generated spend tables — ties
    in spend/order counts are the subtle part (both rankings must use
    the same (value, custkey) total order the SQL declares)."""
    from simple_map_reduce_ruuner_spark.operators.rankstats import (
        PPM,
        gini_of,
        spearman_of,
    )

    df = spark.createDataFrame(
        custs, "o_custkey long, spend_cents long, n_orders long"
    )
    n = len(custs)

    def rank(key):
        order = sorted(custs, key=key)
        return {r[0]: i + 1 for i, r in enumerate(order)}

    rs = rank(lambda r: (-r[1], r[0]))
    ro = rank(lambda r: (-r[2], r[0]))
    sum_d2 = sum((rs[c] - ro[c]) ** 2 for c, _s, _n in custs)
    got = spearman_of(df).collect()[0]
    assert (got.n_customers, got.sum_d2) == (n, sum_d2)
    if n > 1:
        expected_rho = 1.0 - (6 * sum_d2) / (n * (n * n - 1))
        assert got.spearman_rho == expected_rho

    # textbook (average-rank) Spearman: Pearson of fractional tie ranks,
    # computed here over exact 2×-scaled integer ranks like the operator
    from simple_map_reduce_ruuner_spark.operators.rankstats import (
        spearman_avg_rank_of,
    )

    x2 = {}
    y2 = {}
    for key_idx, out in ((1, x2), (2, y2)):
        vals = sorted(r[key_idx] for r in custs)
        first: dict = {}
        cnt: dict = {}
        for i, v in enumerate(vals):
            first.setdefault(v, i + 1)
            cnt[v] = cnt.get(v, 0) + 1
        for r in custs:
            out[r[0]] = 2 * first[r[key_idx]] + cnt[r[key_idx]] - 1
    sx2 = sum(x2.values())
    sy2 = sum(y2.values())
    sxx = sum(v * v for v in x2.values())
    syy = sum(v * v for v in y2.values())
    sxy = sum(x2[c] * y2[c] for c in x2)
    num = n * sxy - sx2 * sy2
    vx = n * sxx - sx2 * sx2
    vy = n * syy - sy2 * sy2
    avg = spearman_avg_rank_of(df).collect()[0]
    # the exact integer terms round-trip the double cast losslessly at
    # this scale (< 2^53)
    assert (avg.n_customers, avg.cov_term, avg.varx_term, avg.vary_term) == (
        n,
        float(num),
        float(vx),
        float(vy),
    )
    import math

    if vx > 0 and vy > 0:
        assert avg.spearman_rho == float(num) / math.sqrt(
            float(vx) * float(vy)
        )
        assert -1.0 - 1e-12 <= avg.spearman_rho <= 1.0 + 1e-12
    else:
        # constant column ⇒ zero variance ⇒ undefined, emitted as NULL
        assert avg.spearman_rho is None

    sx = sum(s for _c, s, _n in custs)
    asc = sorted(custs, key=lambda r: (r[1], r[0]))
    six = sum((i + 1) * r[1] for i, r in enumerate(asc))
    gg = gini_of(df).collect()[0]
    assert (gg.n_customers, gg.total_cents) == (n, sx)
    if sx > 0:
        num = (2 * six - (n + 1) * sx) * PPM
        den = n * sx
        # Spark div / DuckDB // truncate toward zero (num can be ±)
        expected_ppm = abs(num) // den * (1 if num >= 0 else -1)
        assert gg.gini_ppm == expected_ppm
    else:
        # undefined concentration: NULL, not a DIVIDE_BY_ZERO crash
        assert gg.gini_ppm is None
