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


def tokens(col: Column, lowercase: bool = True) -> Column:
    """Array of whitespace-delimited tokens (empty tokens removed).
    DuckDB twin: :data:`TOKS_SQL`."""
    c = F.lower(col) if lowercase else col
    return F.filter(F.split(c, WS), lambda t: t != "")


def chars(col: Column) -> Column:
    """Array of single characters (the reference char_count semantics:
    every char except newline, char_count/mapper.py:8-15)."""
    return F.filter(F.split(col, ""), lambda c: (c != "") & (c != "\n"))


def norm_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), WS, " "))


def word_shingles(col: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined) of a text column.

    Shingling is the standard unit for near-duplicate detection
    (Broder 1997). Built from transform over a token array — stays JVM-side.
    Documents shorter than k words yield a single shingle of all words, so
    every document has at least one shingle.
    """
    toks = tokens(col)
    n = F.size(toks)
    k_lit = F.lit(k)
    count = F.greatest(n - k_lit + 1, F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
