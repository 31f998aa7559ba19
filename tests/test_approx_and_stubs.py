"""Checks with no SQL oracle: HLL error bound, and the multimodal decode
stub's contract (real plan, NotImplementedError surfaces from the UDF)."""

from __future__ import annotations

import pytest

from simple_map_reduce_ruuner_spark.operators.approx import (
    approx_distinct_users,
    exact_distinct_users,
)


def test_approx_distinct_within_5pct(spark, sf_dir):
    exact = {
        r.event_type: r.n_users for r in exact_distinct_users(spark, sf_dir).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in approx_distinct_users(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, n, approx[k])


def test_decode_media_stub_raises(spark, sf_dir):
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.operators.multimodal import (
        _with_payload,
        decode_media_stub,
    )

    plan = decode_media_stub(_with_payload(spark, sf_dir))
    # schema is real and typed even though execution is stubbed
    assert [f.name for f in plan.schema.fields] == [
        "doc_id",
        "width",
        "height",
        "channels",
    ]
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        plan.collect()
