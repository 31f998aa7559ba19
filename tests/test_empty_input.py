"""Degenerate-input robustness: every registry query must run (and agree
with its oracle) on EMPTY tables. At 100 TB empty partitions, empty
filter results, and empty join sides are routine; an operator that
crashes on zero rows (empty np.stack, percentile of nothing, recursive
CTE with an empty base) is not production-ready."""

from __future__ import annotations

import pytest

from simple_map_reduce_ruuner_spark.registry import all_queries
from simple_map_reduce_ruuner_spark.sources.tables import TABLE_NAMES, load_table
from tests._oracle import check_query


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """Write an empty copy of every table with the real (post-load)
    schemas — load_table normalizes events.ts from TIMESTAMP(NANOS)."""
    import glob
    import shutil

    out = tmp_path_factory.mktemp("empty_sf")
    for name in TABLE_NAMES:
        real = load_table(spark, sf_dir, name)
        # repartition(1) so the writer emits exactly one part file, then
        # move it to a plain <name>.parquet FILE — the driver's tables
        # are single files, and DuckDB's read_parquet doesn't glob dirs
        tmp_dir = str(out / f"_{name}_dir")
        spark.createDataFrame([], real.schema).repartition(1).write.parquet(tmp_dir)
        part = glob.glob(f"{tmp_dir}/part-*.parquet")[0]
        shutil.move(part, str(out / f"{name}.parquet"))
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return str(out)


# Known engine divergence, not a bug in either engine's normal domain:
# for GROUP BY ROLLUP/CUBE/GROUPING SETS over EMPTY input, DuckDB emits
# the standard grand-total row for the () grouping set (count=0,
# sum=NULL), while Spark emits zero rows. The engine follows Spark;
# the oracle comparison necessarily disagrees on this degenerate corner.
GROUPING_SETS_ON_EMPTY_DIVERGE = {
    "order_status_rollup",
    "cube_order_stats",
    "grouping_sets_stats",
}


@pytest.mark.parametrize("name", sorted(all_queries().keys()))
def test_query_runs_on_empty_tables(spark, empty_sf_dir, name):
    if name in GROUPING_SETS_ON_EMPTY_DIVERGE:
        result = check_query(spark, empty_sf_dir, name)
        # the query must still RUN; the known divergence is exactly one
        # oracle-side grand-total row
        assert result["rows_spark"] == 0 and result["rows_duck"] == 1, result
        pytest.xfail("Spark emits no () grouping-set row on empty input")
    result = check_query(spark, empty_sf_dir, name)
    assert result["ok"], f"{name}: {result}"
