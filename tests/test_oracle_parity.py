"""Every registry query must match its DuckDB oracle at sf0.001 — the
local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from simple_map_reduce_ruuner_spark.registry import all_queries
from tests._oracle import check_query

QUERY_NAMES = sorted(all_queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    result = check_query(spark, sf_dir, name)
    assert result["ok"], f"{name}: {result}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o).issubset(set(q))
    assert len(q) >= 16
