"""Tie-break pins for the argmin/argmax queries on handcrafted data.

The oracle-parity sweep proves agreement on the driver tables, where
exact ties are improbable — these fixtures FORCE ties and assert the
declared total order resolves them identically in the Spark plan and
the DuckDB oracle (min/max(struct) lexicographic ≡ ORDER BY rank).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        f"{tmp_path}/{name}.parquet"
    )


@pytest.fixture()
def tie_sf_dir(spark, tmp_path):
    """Two ASIA suppliers offering part 1 at the SAME unit price; a
    cheaper non-ASIA supplier that must be ignored; one month where two
    suppliers tie on revenue exactly."""
    _write(spark, tmp_path, "region", [(0, "ASIA"), (1, "EUROPE")],
           "r_regionkey int, r_name string")
    _write(spark, tmp_path, "nation", [(0, "JAPAN", 0), (1, "FRANCE", 1)],
           "n_nationkey int, n_name string, n_regionkey int")
    _write(spark, tmp_path, "supplier",
           [(10, "s_asia_a", 0, 0.0), (20, "s_asia_b", 0, 0.0),
            (30, "s_europe", 1, 0.0)],
           "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    _write(spark, tmp_path, "part", [(1, "red widget", "Brand#1", "STANDARD", 1, 1.0)],
           "p_partkey long, p_name string, p_brand string, p_type string,"
           " p_size int, p_retailprice double")
    ts = "2024-03-05 00:00:00"
    # unit price 5.0 for both ASIA suppliers (tie), 1.0 for EUROPE;
    # revenue tie in month 202403: suppliers 10 and 20 both sum 10.0.
    _write(spark, tmp_path, "lineitem",
           [(100, 1, 10, 1, 2.0, 10.0, 0.0, 0.0, "N", "O", ts),
            (101, 1, 20, 1, 2.0, 10.0, 0.0, 0.0, "N", "O", ts),
            (102, 1, 30, 1, 2.0, 2.0, 0.0, 0.0, "N", "O", ts)],
           "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
           " l_quantity double, l_extendedprice double, l_discount double,"
           " l_tax double, l_returnflag string, l_linestatus string,"
           " l_shipdate string")
    # rewrite lineitem with a real timestamp column
    df = spark.read.parquet(f"{tmp_path}/lineitem.parquet").withColumn(
        "l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem2.parquet")
    import shutil

    shutil.rmtree(f"{tmp_path}/lineitem.parquet")
    shutil.move(f"{tmp_path}/lineitem2.parquet", f"{tmp_path}/lineitem.parquet")
    return str(tmp_path)


def _oracle(tie_sf_dir, sql):
    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "part", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{tie_sf_dir}/{t}.parquet/*.parquet')"
        )
    return con.execute(sql).fetchall()


def test_min_cost_supplier_tie_goes_to_smaller_suppkey(spark, tie_sf_dir):
    from simple_map_reduce_ruuner_spark.operators import relational8

    got = relational8.regional_min_cost_supplier(spark, tie_sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    # both ASIA suppliers tie at unit 5.0 — smaller key (10) must win,
    # and the cheaper EUROPE supplier must have been excluded
    assert (row.p_partkey, row.s_name, row.unit_cost) == (1, "s_asia_a", 5.0)
    oracle = _oracle(
        tie_sf_dir, relational8.REGIONAL_MIN_COST_SUPPLIER_SQL
    )
    assert [(r[0], r[2], r[3]) for r in oracle] == [(1, "s_asia_a", 5.0)]


def test_monthly_top_supplier_tie_goes_to_larger_suppkey(spark, tie_sf_dir):
    from simple_map_reduce_ruuner_spark.operators import relational7

    got = relational7.monthly_top_supplier(spark, tie_sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    # suppliers 10 and 20 tie at 10.0 revenue in 202403 — max(struct)
    # breaks toward the LARGER key, as the oracle's DESC rank declares
    assert (row.ship_month, row.top_suppkey, row.revenue) == (202403, 20, 10.0)
    oracle = _oracle(tie_sf_dir, relational7.MONTHLY_TOP_SUPPLIER_SQL)
    assert oracle == [(202403, 20, 10.0)]
