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
