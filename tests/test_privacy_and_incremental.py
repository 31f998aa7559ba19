"""Semantic pins for the r13 corpus-lifecycle additions: PII scrub,
incremental (batch-vs-corpus) dedup, and the mixture sampling plan.

Oracle-hash parity is covered by test_oracle_parity for all of these;
this file pins the properties the hash alone doesn't spell out — the
redaction actually removes every match, the incremental classifier
partitions the batch, the sampler is deterministic and within bounds —
plus the plan shapes (pii_scrub must stay a zero-exchange map)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators import privacy
from simple_map_reduce_ruuner_spark.operators.dedup import (
    INCR_MOD,
    INCR_REM,
    incremental_dedup,
)
from simple_map_reduce_ruuner_spark.operators.mixing import mixture_sample_plan
from simple_map_reduce_ruuner_spark.operators.privacy import (
    _redact,
    _with_pii,
    pii_scrub,
    pii_summary,
)
from simple_map_reduce_ruuner_spark.sources.tables import load_table


def test_redaction_removes_every_match(spark, sf_dir):
    """After the scrub, none of the three patterns can match anywhere."""
    docs = _with_pii(load_table(spark, sf_dir, "documents"))
    red = docs.select(_redact(F.col("text")).alias("t"))
    residual = red.filter(
        (F.regexp_count(F.col("t"), F.lit(privacy.EMAIL_RE)) > 0)
        | (F.regexp_count(F.col("t"), F.lit(privacy.PHONE_RE)) > 0)
        | (F.regexp_count(F.col("t"), F.lit(privacy.IP_RE)) > 0)
    )
    assert residual.count() == 0


def test_pii_scrub_counts_multi_type_docs(spark, sf_dir):
    """A doc hitting two fixture residues reports both span types, and
    every flagged doc's counts match its residues exactly."""
    rows = {r["doc_id"]: r for r in pii_scrub(spark, sf_dir).collect()}
    assert rows, "fixture residues must flag some docs"
    n_docs = load_table(spark, sf_dir, "documents").count()
    multi = 0
    for doc_id, r in rows.items():
        assert r["n_emails"] == (
            1 if doc_id % privacy.EMAIL_MOD == privacy.EMAIL_REM else 0
        )
        assert r["n_phones"] == (
            1 if doc_id % privacy.PHONE_MOD == privacy.PHONE_REM else 0
        )
        assert r["n_ips"] == (
            1 if doc_id % privacy.IP_MOD == privacy.IP_REM else 0
        )
        if r["n_emails"] + r["n_phones"] + r["n_ips"] > 1:
            multi += 1
    # CRT: any 77 (= 7*11) consecutive doc_ids contain an email+phone
    # overlap, so past that window a multi-type doc must exist
    if n_docs >= 77:
        assert multi > 0


def test_pii_scrub_zero_shuffle_plan(spark, sf_dir):
    """The scrub is a pure narrow map — no SEMANTIC shuffle anywhere.
    The only exchange allowed is spread_scan's small-file split (a
    no-op at production split counts), which since r15 hash-partitions
    on the near-unique doc_id instead of round-robin (no
    sortBeforeRepartition pass, deterministic under retry by key)."""
    plan = pii_scrub(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1  # spread_scan's split only
    # any hash partitioning present must be spread_scan's doc_id split,
    # never a key synthesized by the scrub itself
    import re

    for m in re.finditer(r"hashpartitioning\(([^#)]+)#", plan):
        assert m.group(1).strip() == "doc_id", plan


def test_pii_summary_totals_reconcile(spark, sf_dir):
    """Summary totals equal the per-doc scrub's column sums."""
    per_doc = pii_scrub(spark, sf_dir).agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_ips").alias("i"),
    ).collect()[0]
    summ = pii_summary(spark, sf_dir).agg(
        F.sum("total_emails").alias("e"),
        F.sum("total_phones").alias("p"),
        F.sum("total_ips").alias("i"),
    ).collect()[0]
    assert (per_doc["e"], per_doc["p"], per_doc["i"]) == (
        summ["e"],
        summ["p"],
        summ["i"],
    )


def test_incremental_dedup_partitions_the_batch(spark, sf_dir):
    """Every incoming doc is classified exactly once; match_doc_id is
    null iff 'new', points outside the batch for 'dup_of_corpus' and to
    an earlier batch doc for 'dup_in_batch'."""
    docs = load_table(spark, sf_dir, "documents")
    incoming_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % INCR_MOD == INCR_REM)
        .select("doc_id")
        .collect()
    }
    rows = incremental_dedup(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == incoming_ids
    assert len(rows) == len(incoming_ids)
    for r in rows:
        if r["status"] == "new":
            assert r["match_doc_id"] is None
        elif r["status"] == "dup_of_corpus":
            assert r["match_doc_id"] % INCR_MOD != INCR_REM
        else:
            assert r["status"] == "dup_in_batch"
            assert r["match_doc_id"] % INCR_MOD == INCR_REM
            assert r["match_doc_id"] < r["doc_id"]


def test_mixture_sample_is_deterministic_and_bounded(spark, sf_dir):
    rows = {r["source"]: r for r in mixture_sample_plan(spark, sf_dir).collect()}
    again = {
        r["source"]: r for r in mixture_sample_plan(spark, sf_dir).collect()
    }
    assert rows.keys() == again.keys()
    for src, r in rows.items():
        assert 0 <= r["rate_ppm"] <= 1_000_000
        assert 0 <= r["kept_docs"] <= r["n_docs"]
        assert 0 <= r["kept_tokens"] <= r["n_tokens"]
        # full-rate sources keep everything (hash % 1e6 < 1e6 always)
        if r["rate_ppm"] == 1_000_000:
            assert r["kept_docs"] == r["n_docs"]
            assert r["kept_tokens"] == r["n_tokens"]
        a = again[src]
        assert (r["kept_docs"], r["kept_tokens"]) == (
            a["kept_docs"],
            a["kept_tokens"],
        )


def test_leakage_safe_split_never_splits_duplicates(spark, sf_dir):
    """The property dataset_split lacks: two docs with identical
    normalized text must land in the same split. Recomputed per doc and
    cross-checked against the aggregate's group accounting."""
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.functions.hashing import hash60
    from simple_map_reduce_ruuner_spark.functions.text import norm_text
    from simple_map_reduce_ruuner_spark.operators.training import (
        SPLIT_BUCKETS,
        TRAIN_LT,
        VAL_LT,
        leakage_safe_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    h = hash60(norm_text(F.col("text")))
    bucket = F.pmod(
        hash60(F.concat(F.lit("gsplit:"), h.cast("string"))),
        F.lit(SPLIT_BUCKETS),
    )
    split = (
        F.when(bucket < TRAIN_LT, "train")
        .when(bucket < VAL_LT, "val")
        .otherwise("test")
    )
    per_group = docs.select(h.alias("grp"), split.alias("split")).groupBy(
        "grp"
    ).agg(F.count_distinct("split").alias("n_splits"))
    assert per_group.filter(F.col("n_splits") > 1).count() == 0

    agg = leakage_safe_split(spark, sf_dir).collect()
    assert sum(r.n_docs for r in agg) == docs.count()
    assert all(r.n_groups <= r.n_docs for r in agg)


def test_mixture_rates_downsample_overrepresented_sources(spark, sf_dir):
    """The max-token source's rate must be below 1e6 whenever sources
    are imbalanced (it holds more than the uniform share)."""
    rows = mixture_sample_plan(spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    k = len(rows)
    for r in rows:
        if r["n_tokens"] * k > total:
            assert r["rate_ppm"] < 1_000_000


def test_neardup_incremental_consistent_with_full_lsh(spark, sf_dir):
    """The incremental classification must agree with the full banded-LSH
    candidate set: an incoming doc is 'neardup_of_corpus' iff the full
    pair list links it to at least one corpus-slice doc, and the match
    is the minimum such doc."""
    from simple_map_reduce_ruuner_spark.operators.dedup import (
        INCR_MOD,
        INCR_REM,
        neardup_incremental_lsh,
        neardup_minhash_lsh,
    )

    inc = {
        r.doc_id: (r.status, r.match_doc_id, r.n_band_hits)
        for r in neardup_incremental_lsh(spark, sf_dir).collect()
    }
    pairs = neardup_minhash_lsh(spark, sf_dir).collect()

    def is_batch(d):
        return d % INCR_MOD == INCR_REM

    corpus_matches: dict[int, list[int]] = {}
    for p in pairs:
        for a, b in ((p.doc_a, p.doc_b), (p.doc_b, p.doc_a)):
            if is_batch(a) and not is_batch(b):
                corpus_matches.setdefault(a, []).append(b)
    # every incoming doc classified exactly once
    n_incoming = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % INCR_MOD == INCR_REM)
        .count()
    )
    assert len(inc) == n_incoming
    for doc, (status, match, hits) in inc.items():
        want = corpus_matches.get(doc)
        if want:
            assert status == "neardup_of_corpus" and match == min(want), doc
            assert hits >= 1
        else:
            assert status == "novel" and match is None and hits == 0, doc


def test_ewma_first_event_and_decay(spark, sf_dir):
    """Per user: the first event's EWMA equals its own cents value, and
    every step's EWMA lies between the previous EWMA and the new value
    (convexity of s = y/8 + 7s/8)."""
    from simple_map_reduce_ruuner_spark.operators.timeseries import ewma_value

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("value").cast("decimal(12,2)") * 100).cast("long")).alias(
            "cents"
        ),
    )
    order = {
        (r.user_id, r.event_id): (i, r.cents)
        for u, rows in (
            (u, sorted(g, key=lambda r: (r.ts, r.event_id)))
            for u, g in __import__("itertools").groupby(
                sorted(ev.collect(), key=lambda r: r.user_id),
                key=lambda r: r.user_id,
            )
        )
        for i, r in enumerate(rows)
    }
    got = ewma_value(spark, sf_dir).collect()
    assert len(got) == len(order)
    by_user: dict[int, list] = {}
    for r in got:
        idx, cents = order[(r.user_id, r.event_id)]
        by_user.setdefault(r.user_id, []).append((idx, cents, r.ewma_cents))
    for rows in by_user.values():
        rows.sort()
        assert abs(rows[0][1] - rows[0][2]) < 1e-6  # s0 = y0
        for (_, _, prev_s), (_, y, s) in zip(rows, rows[1:]):
            lo, hi = min(prev_s, y), max(prev_s, y)
            assert lo - 1e-6 <= s <= hi + 1e-6
