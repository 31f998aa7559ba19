"""Python UDTF surface: lateral-join expansion matches the JVM built-in
twin on the same data (the twin is the production path; the UDTF is the
API-coverage shape for per-row Python with multi-row output)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_explode_props_matches_jvm_twin(spark, sf_dir):
    from simple_map_reduce_ruuner_spark.functions.udtfs import register_udtfs
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    register_udtfs(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_udtf")

    via_udtf = spark.sql(
        "SELECT e.event_id, p.key, p.value "
        "FROM ev_udtf e, LATERAL explode_props(e.props) p"
    )
    via_builtin = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.explode(F.from_json("props", "map<string,string>")).alias(
                "key", "value"
            ),
        )
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_builtin.collect()))
    assert a == b
    assert len(a) > 0


def test_pos_tokens_lateral(spark):
    from simple_map_reduce_ruuner_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "Alpha beta  alpha"), (2, ""), (3, None)], "id long, txt string"
    ).createOrReplaceTempView("docs_udtf")
    rows = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT d.id, t.term, t.pos "
                "FROM docs_udtf d, LATERAL pos_tokens(d.txt) t"
            ).collect(),
        )
    )
    assert rows == [(1, "alpha", 0), (1, "alpha", 2), (1, "beta", 1)]
