"""doc_lm_familiarity ppm math must survive >9.2e12 total token
occurrences (the int64 wrap point of sum_cnt * 1e6) — the 100 TB corpus
regime. Exercises PPM_EXPR, the exact expression doc_lm_familiarity
projects, against exact Python big-int arithmetic."""

from __future__ import annotations

from simple_map_reduce_ruuner_spark.operators.textlm import PPM_EXPR


def test_ppm_expr_survives_9e12_occurrences(spark):
    rows = [
        # sum_cnt just past the int64/1e6 wrap point: 9.3e12 * 1e6 > 2^63
        (9_300_000_000_000, 3_000_000, 3_100_000_000_000),
        # both numerator and denominator far past int64 (n_tokens * total ~ 9e25)
        (18_446_744_073_709_551, 1_000_000_000, 92_233_720_368_547_758),
        # small sanity row
        (5, 2, 10),
    ]
    df = spark.createDataFrame(rows, "sum_cnt long, n_tokens long, total long")
    out = df.selectExpr(f"{PPM_EXPR} AS ppm")
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["bigint"]
    got = [r.ppm for r in out.collect()]
    want = [s * 1_000_000 // (n * t) for s, n, t in rows]
    assert got == want
