"""Salted sequence packing (training.sequence_pack_bins_salted):
equivalence with the unsalted packer modulo the shard namespace, plus
the bounded-partition plan shape (r11 verdict item 7 — the SCALE.md
salting recipe as tested code)."""

from __future__ import annotations

from simple_map_reduce_ruuner_spark.operators import training


def test_salted_equals_unsalted_per_shard(spark, sf_dir):
    """Within every (lang, shard), the salted assignment must be exactly
    what the unsalted concat-then-cut packer produces when run on that
    shard's documents alone: same doc order, cumsum restarted at zero,
    same capacity cut. Recomputed independently in pandas."""
    out = training.sequence_pack_bins_salted(spark, sf_dir).toPandas()
    assert (out["shard"] == out["doc_id"] // training.PACK_SALT_DOCS).all()

    for (_, _), grp in out.groupby(["lang", "shard"]):
        g = grp.sort_values("doc_id").reset_index(drop=True)
        before = g["n_tokens"].cumsum() - g["n_tokens"]
        assert (g["bin_id"] == before // training.PACK_CAPACITY).all()
        assert (g["bin_offset"] == before % training.PACK_CAPACITY).all()


def test_salted_tokenization_matches_unsalted(spark, sf_dir):
    """Both packers must size documents identically — n_tokens is the
    shared currency, so a tokenizer drift between the twins would make
    the 100 TB swap silently change bins."""
    salted = (
        training.sequence_pack_bins_salted(spark, sf_dir)
        .select("doc_id", "n_tokens")
        .toPandas()
        .set_index("doc_id")["n_tokens"]
    )
    plain = (
        training.sequence_pack_bins(spark, sf_dir)
        .select("doc_id", "n_tokens")
        .toPandas()
        .set_index("doc_id")["n_tokens"]
    )
    assert salted.sort_index().equals(plain.sort_index())


def test_salted_waste_is_bounded(spark, sf_dir):
    """Salting must never create extra bins: per (lang, shard), the
    number of start bins is at most ceil(total_tokens / capacity) — the
    same bound the unsalted packer has on the whole language. (bin_id
    records where a document STARTS, so the max over non-empty docs is
    bounded by the token prefix before the last of them.)"""
    out = training.sequence_pack_bins_salted(spark, sf_dir).toPandas()
    cap = training.PACK_CAPACITY
    for (_, _), grp in out.groupby(["lang", "shard"]):
        total = int(grp["n_tokens"].sum())
        sized = grp[grp["n_tokens"] > 0]
        if sized.empty:
            assert (grp["bin_id"] == 0).all()  # all-empty shard: bin 0
            continue
        used_bins = int(sized["bin_id"].max()) + 1
        assert used_bins <= max(1, -(-total // cap))


def test_salted_plan_single_bounded_exchange(spark, sf_dir):
    """Same plan budget as the unsalted anchor — one hash exchange (now
    on the salted key) plus the window sort; token sizing stays
    map-side. The salt must not add a shuffle."""
    from tests.test_plans import plan_of

    plan = plan_of(training.sequence_pack_bins_salted(spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "shard" in plan  # the exchange key really is salted


def test_webdataset_shard_plan_equals_global_window(spark, sf_dir):
    """The hierarchical prefix-sum formulation must equal the naive
    single-window cumsum exactly (the DuckDB oracle IS the naive form;
    this pins the equivalence Spark-side too)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.operators.training import (
        SHARD_TARGET_BYTES,
        webdataset_shard_plan,
    )
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.length(F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"))
        .cast("long")
        .alias("payload"),
    ).withColumn(
        "entry", F.lit(512) + F.ceil(F.col("payload") / 512).cast("long") * 512
    )
    w = Window.orderBy("doc_id")  # the naive global window
    naive = (
        sized.withColumn(
            "cum_before", F.sum("entry").over(w) - F.col("entry")
        )
        .groupBy(
            F.floor(F.col("cum_before") / SHARD_TARGET_BYTES)
            .cast("long")
            .alias("shard_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("payload").alias("payload_bytes"),
            (F.sum("entry") + F.lit(1024)).cast("long").alias("tar_bytes"),
        )
    )
    got = sorted(map(tuple, webdataset_shard_plan(spark, sf_dir).collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got and got == want


def test_webdataset_shard_plan_sizes_and_census(spark, sf_dir):
    """Every doc lands in exactly one shard; every shard's archive size
    is bounded by target + one max entry + end marker (virtual-offset
    packing can overshoot by at most the entry that crosses the
    boundary); shard_ids are dense from 0."""
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.operators.training import (
        SHARD_TARGET_BYTES,
        webdataset_shard_plan,
    )
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    rows = webdataset_shard_plan(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_members for r in rows) == n_docs
    ids = sorted(r.shard_id for r in rows)
    assert ids == list(range(len(ids)))
    max_entry = max(
        r.tar_bytes - 1024 for r in rows
    )  # loose but sufficient upper bound on any single entry
    for r in rows:
        assert r.tar_bytes <= SHARD_TARGET_BYTES + max_entry + 1024, r
