"""Text column helpers shared by the word/char/dedup/text-analysis operators.

All helpers are pure built-in-function compositions (JVM-side, inside
whole-stage codegen) — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Whitespace-run tokenizer — the reference's ``cin >> str`` / ``split()``
#: semantics (word_count/mapper.cpp:22-25, finding_the_suspects/mapper.py:8-12).
WS = r"\s+"

# DuckDB twin of tokens() below — the ONE canonical tokenizer literal.
# Operator modules import this instead of re-typing it; a differential
# test (test_registry_census) pins the pair, and every remaining inline
# copy in oracle strings is grep-guarded against drift.
TOKS_SQL = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"

# DuckDB twin of norm_text() below, same single-source rule as TOKS_SQL
# (review-found: three modules carried byte-identical private copies).
NORM_TEXT_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


def explode_tokens(df, text_col: str = "text", out: str = "token", keep=()):
    """``df`` → one row per whitespace token of ``text_col`` (lowercased,
    empties dropped), named ``out``, with ``keep`` columns carried along.

    Row-for-row identical to ``F.explode(tokens(col))`` but the
    empty-token filter runs as a post-explode WHERE instead of the array
    higher-order ``filter``: HOFs are evaluated interpreted, per array
    element, outside whole-stage codegen, while split → explode → Filter
    stays in one codegen span. On per-token hot paths (word/bigram/
    simhash/tf-idf) that interpreter hop is the dominant CPU cost, so
    every exploding call site uses this instead of ``tokens()``;
    ``tokens()`` remains the canonical form where the ARRAY itself is
    the operand (shingles, per-doc vocab)."""
    return df.select(
        *keep, F.explode(F.split(F.lower(F.col(text_col)), WS)).alias(out)
    ).where(F.col(out) != "")


def explode_chars(df, text_col: str = "text", out: str = "ch", keep=()):
    """``df`` → one row per character of ``text_col`` (newlines excluded
    — the reference char_count semantics, char_count/mapper.py:8-15),
    named ``out``, with ``keep`` columns carried along.

    Chars analogue of :func:`explode_tokens`, same codegen rationale:
    newlines are stripped string-side (translate), then split → explode
    → WHERE-empty runs as one whole-stage-codegen span instead of an
    interpreted array-HOF filter."""
    return df.select(
        *keep,
        F.explode(F.split(F.translate(F.col(text_col), "\n", ""), "")).alias(
            out
        ),
    ).where(F.col(out) != "")


def tokens(col: Column, lowercase: bool = True) -> Column:
    """Array of whitespace-delimited tokens (empty tokens removed).
    DuckDB twin: :data:`TOKS_SQL`.

    ``array_remove(split(...), '')`` — identical semantics to the
    higher-order ``filter(…, t -> t <> '')`` (remove ALL empty-string
    elements), but array_remove is an ordinary collection expression
    with codegen, while lambda HOFs are interpreted per element. Every
    array consumer (shingles, per-doc vocab, token counts) rides this."""
    c = F.lower(col) if lowercase else col
    return F.array_remove(F.split(c, WS), "")


def chars(col: Column) -> Column:
    """Array of single characters (the reference char_count semantics:
    every char except newline, char_count/mapper.py:8-15). Newlines are
    stripped string-side (translate) so the array filter reduces to the
    codegen-friendly array_remove (see tokens)."""
    return F.array_remove(F.split(F.translate(col, "\n", ""), ""), "")


def norm_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), WS, " "))


def word_shingles(col: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined) of a text column.

    Shingling is the standard unit for near-duplicate detection
    (Broder 1997). Built from transform over a token array — stays JVM-side.
    Documents shorter than k words yield a single shingle of all words, so
    every document has at least one shingle.

    The token array is LET-BOUND via a single-element outer transform
    (``flatten(transform(array(tokens), toks -> …))``): a lambda that
    closes over the raw ``tokens(col)`` expression re-evaluates the
    whole split per shingle position — O(tokens²) per document —
    because interpreted HOF bodies get no subexpression reuse. Binding
    it to a lambda variable makes each inner ``slice`` a plain value
    lookup. Measured on the sf0.1 corpus: 2.8 s → 0.33 s for the
    3-shingle explode, byte-identical output.
    """
    k_lit = F.lit(k)

    def build(toks: Column) -> Column:
        count = F.greatest(F.size(toks) - k_lit + 1, F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), count - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )

    return F.flatten(F.transform(F.array(tokens(col)), build))
