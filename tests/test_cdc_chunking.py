"""The property that justifies content-defined chunking: boundaries
re-synchronize after an edit.

Fixed-offset chunking shifts every boundary after an insertion, so all
downstream chunks change hash. Content-defined boundaries depend only
on a local 3-gram, so an insertion can only affect the chunk(s) whose
boundary hash-window touches the edit — the chunk containing the edit,
plus at most its predecessor (whose CLOSING boundary 3-gram can overlap
the insertion point). Every chunk lying entirely before, and every
chunk starting after, the edit's hash window must survive
byte-identical. The test runs the REAL oracle SQL (DuckDB, same
formulation as the Spark plan) over synthetic documents."""

from __future__ import annotations

import random

import duckdb

from simple_map_reduce_ruuner_spark.operators.curation import (
    CDC_SHINGLE,
    _cdc_chunk_dedup_sql,
)

# chunk-listing variant of the registry query's SQL: same CTEs, but we
# need per-chunk spans + hashes instead of the final duplicate rollup
_CHUNKS_SQL = _cdc_chunk_dedup_sql().split("SELECT chunk_hash,")[0] + (
    "SELECT doc_id, chunk_id, min(pos) AS first_pos, max(pos) AS last_pos, "
    "md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_hash "
    "FROM chunked GROUP BY 1, 2"
)


def _chunks(tokens_: list[str]) -> list[tuple[int, int, str]]:
    """[(first_pos, last_pos, chunk_hash)] for one synthetic document
    via the oracle formulation (1-based positions)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [" ".join(tokens_)])
    rows = con.execute(_CHUNKS_SQL).fetchall()
    return sorted((r[2], r[3], r[4]) for r in rows)


def test_insertion_only_disturbs_chunks_near_the_edit():
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(50)]
    base = [rng.choice(vocab) for _ in range(400)]
    orig = _chunks(base)

    for trial in range(5):
        at = rng.randrange(50, 350)  # INSERTED becomes 1-based position at+1
        edited = base[:at] + ["INSERTED"] + base[at:]
        new = _chunks(edited)

        # a boundary at 1-based position i reads tokens i..i+SHINGLE-1,
        # so boundaries at positions ≤ at+1-SHINGLE are unaffected and
        # any chunk ending before position at+1-SHINGLE is untouched
        safe_end = at + 1 - CDC_SHINGLE
        before_orig = [h for lo, hi, h in orig if hi < safe_end]
        before_new = [h for lo, hi, h in new if hi < safe_end]
        assert before_orig == before_new, f"trial {trial}: prefix disturbed"

        # downstream: chunks starting after the edit's hash window must
        # ALL reappear (shifted one position right)
        after_orig = [h for lo, hi, h in orig if lo > at + 1]
        new_hashes = {h for _, _, h in new}
        missing = [h for h in after_orig if h not in new_hashes]
        assert not missing, (
            f"trial {trial}: {len(missing)} downstream chunks changed — "
            "boundaries did not re-synchronize"
        )

        # and the blast radius is tiny: at most 3 chunk hashes differ in
        # total (edit chunk, its predecessor, a possible split extra)
        diff = {h for _, _, h in orig} ^ new_hashes
        assert len(diff) <= 2 * 3, f"trial {trial}: blast radius {len(diff)}"


def test_fixed_offset_chunking_would_not_resync():
    """Negative control documenting the motivation: with fixed-width
    boundaries every post-edit chunk changes."""
    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(50)]
    base = [rng.choice(vocab) for _ in range(400)]
    width = 16

    def fixed_chunks(toks):
        return {
            " ".join(toks[i : i + width]) for i in range(0, len(toks), width)
        }

    at = 50
    edited = base[:at] + ["INSERTED"] + base[at:]
    shared = fixed_chunks(base) & fixed_chunks(edited)
    # only the chunks fully before the edit survive
    assert len(shared) <= (at // width) + 1
