"""The all-pairs ANCHORS enforce their scale contracts: above a hard
input ceiling they must refuse (reading only parquet FOOTER metadata —
no Spark job) and point the caller at their verified sub-quadratic
twins. A silent success on oversized input would be the 100 TB
scale-killer the guards exist to prevent.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from simple_map_reduce_ruuner_spark.operators import dedup


def _write(dir_path, name, table):
    path = dir_path / f"{name}.parquet"
    pq.write_table(table, path)
    return str(path)


@pytest.fixture()
def tiny_sf(tmp_path):
    _write(
        tmp_path,
        "documents",
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["a b c d e f", "a b c d e g", "x y z w v u"],
            }
        ),
    )
    _write(
        tmp_path,
        "embeddings",
        pa.table(
            {"vec_id": [1, 2, 3], "embedding": [[1.0, 0.0]] * 3}
        ),
    )
    return str(tmp_path)


def test_neardup_jaccard_refuses_oversized_input(spark, tiny_sf, monkeypatch):
    monkeypatch.setattr(dedup, "MAX_ALLPAIRS_DOCS", 2)
    with pytest.raises(ValueError, match="neardup_lsh_verified"):
        dedup.neardup_jaccard(spark, tiny_sf)


def test_neardup_embedding_refuses_oversized_build_side(
    spark, tiny_sf, monkeypatch
):
    monkeypatch.setattr(dedup, "MAX_BROADCAST_VECTORS", 2)
    with pytest.raises(ValueError, match="neardup_embedding_lsh"):
        dedup.neardup_embedding(spark, tiny_sf)


def test_guards_admit_in_contract_input(spark, tiny_sf):
    """Below the ceiling both anchors run normally on the same fixture
    (so the guard tests above prove the REFUSAL, not a broken path)."""
    assert dedup.neardup_jaccard(spark, tiny_sf).count() >= 1
    assert dedup.neardup_embedding(spark, tiny_sf).count() >= 1
