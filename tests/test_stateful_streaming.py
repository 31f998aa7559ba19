"""applyInPandasWithState: running per-user totals across MULTIPLE
micro-batches (maxFilesPerTrigger=1 over a 4-file source) must converge
to the batch aggregate — state carries between batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.sources.tables import load_table
from simple_map_reduce_ruuner_spark.streaming.stateful import (
    stream_running_user_totals,
)
from simple_map_reduce_ruuner_spark.streaming.windows import EVENTS_DDL


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """Two sequential availableNow runs over a growing source directory,
    sharing one checkpoint: the second run restores state from the first
    (recovery), so running totals keep counting instead of restarting."""
    src_dir = tmp_path / "events_stream"
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, sf_dir, "events")
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.parquet(str(src_dir))

    def run_once(name: str):
        import pandas as pd

        captured: list = []

        def sink(batch_df, batch_id):
            captured.append(batch_df.toPandas())

        q = (
            stream_running_user_totals(spark, str(src_dir), EVENTS_DDL)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return pd.concat(captured, ignore_index=True)

    updates1 = run_once("running_totals_1")
    half = {
        r.user_id: r.n
        for r in first.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert updates1.groupby("user_id")["n_events"].max().to_dict() == half

    # append the second half of the data, resume from the same checkpoint
    second.coalesce(1).write.mode("append").parquet(str(src_dir))
    updates2 = run_once("running_totals_2")

    expected = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # totals CONTINUED from restored state (not restarted at zero)
    assert updates2.groupby("user_id")["n_events"].max().to_dict() == expected


def _protobuf_works() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state_plan_builds(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 successor API): the streaming
    plan must build with the right schema even where google.protobuf
    (its runtime state-protocol dependency) is broken; execution is
    covered by the test below wherever protobuf works."""
    from simple_map_reduce_ruuner_spark.streaming.stateful import (
        stream_running_user_totals_tws,
    )
    from simple_map_reduce_ruuner_spark.streaming.windows import EVENTS_DDL

    src_dir = tmp_path / "events_tws_plan"
    load_table(spark, sf_dir, "events").limit(100).coalesce(1).write.parquet(
        str(src_dir)
    )
    df = stream_running_user_totals_tws(spark, str(src_dir), EVENTS_DDL)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
    ]


@pytest.mark.skipif(
    not _protobuf_works(), reason="google.protobuf broken in this container"
)
def test_transform_with_state_executes(spark, sf_dir, tmp_path):
    import pandas as pd

    from simple_map_reduce_ruuner_spark.streaming.stateful import (
        stream_running_user_totals_tws,
    )
    from simple_map_reduce_ruuner_spark.streaming.windows import EVENTS_DDL

    src_dir = tmp_path / "events_tws"
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).write.parquet(str(src_dir))
    captured: list = []
    q = (
        stream_running_user_totals_tws(spark, str(src_dir), EVENTS_DDL)
        .writeStream.foreachBatch(lambda b, i: captured.append(b.toPandas()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = pd.concat(captured, ignore_index=True)
    expected = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert out.groupby("user_id")["n_events"].max().to_dict() == expected
