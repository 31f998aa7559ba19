"""PII detection and redaction over the document corpus.

The privacy pass of an LLM training-data pipeline (alongside dedup and
quality filtering): find personally-identifiable spans — emails, phone
numbers, bare IPv4 addresses — count them, and rewrite the text with
typed placeholder tokens. Both the detection counts AND the redacted
bytes are oracle-checked: the output carries a 60-bit digest of the
redacted text, so the DuckDB twin must reproduce the rewrite
byte-for-byte, not just agree on how many matches there were.

The synthetic corpus contains no real PII, so each query derives a
deterministic fixture column first: documents at fixed doc_id residues
get an email / phone / IPv4 spliced into their text, constructed
identically by both engines (same self-contained-fixture pattern as
mixing.EVAL_MOD's eval slice). The operator under test is the regex
scrub itself, which is engine-portable: the three patterns below are
valid and equivalent in Java regex (Spark) and RE2 (DuckDB) — no
backreferences, no lookaround.

Scale shape: the scrub is a pure narrow map — regexp_count/replace are
JVM-side codegen expressions, zero exchanges in ``pii_scrub``'s plan —
so at 100 TB it rides the parquet scan. ``pii_summary`` adds one
partial-aggregated groupBy on the low-cardinality (source, lang) key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.functions.hashing import hash60, hash60_sql
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table, spread_scan

# Fixture residues: which docs get which synthetic PII span. Chosen
# pairwise-coprime-ish so the three classes overlap on some docs
# (doc_id 158 gets an email AND a phone, etc.) — the scrub must handle
# multi-type documents, not just one span each.
EMAIL_MOD, EMAIL_REM = 7, 3
PHONE_MOD, PHONE_REM = 11, 5
IP_MOD, IP_REM = 13, 2

# Engine-portable patterns (Java regex and RE2 agree on all three).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"
IP_RE = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def _with_pii(docs: DataFrame) -> DataFrame:
    """Splice deterministic synthetic PII spans into the text."""
    d = F.col("doc_id")
    s = d.cast("string")
    email = F.concat(F.lit(" reach user"), s, F.lit("@example.com soon"))
    phone = F.concat(
        F.lit(" call +1-555-"),
        F.lpad((d % 10_000).cast("string"), 4, "0"),
        F.lit(" today"),
    )
    ip = F.concat(
        F.lit(" from 10."),
        (d % 256).cast("string"),
        F.lit("."),
        (d % 100).cast("string"),
        F.lit("."),
        (d % 50).cast("string"),
        F.lit(" logged"),
    )
    text = F.concat(
        F.col("text"),
        F.when(d % EMAIL_MOD == EMAIL_REM, email).otherwise(F.lit("")),
        F.when(d % PHONE_MOD == PHONE_REM, phone).otherwise(F.lit("")),
        F.when(d % IP_MOD == IP_REM, ip).otherwise(F.lit("")),
    )
    return docs.select("doc_id", "source", "lang", text.alias("text"))


#: DuckDB twin of ``_with_pii``'s text expression (identical splice).
_PII_TEXT_SQL = f"""
    text
    || CASE WHEN doc_id % {EMAIL_MOD} = {EMAIL_REM}
            THEN ' reach user' || CAST(doc_id AS VARCHAR)
                 || '@example.com soon' ELSE '' END
    || CASE WHEN doc_id % {PHONE_MOD} = {PHONE_REM}
            THEN ' call +1-555-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || ' today' ELSE '' END
    || CASE WHEN doc_id % {IP_MOD} = {IP_REM}
            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST(doc_id % 100 AS VARCHAR)
                 || '.' || CAST(doc_id % 50 AS VARCHAR)
                 || ' logged' ELSE '' END
"""


def _redact(col: Column) -> Column:
    """Fixed-order typed redaction: emails, then phones, then IPs.

    Order matters for byte-identical output (an email's domain contains
    dots and digits; redacting emails first means the IP pass can never
    fire inside one) — the oracle applies the same order.
    """
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IP_RE, "<IP>")


def _redact_sql(col: str) -> str:
    # plain concatenation, not str.format — the regexes contain literal
    # braces ({2,}) that format() would try to interpolate
    return (
        "regexp_replace(regexp_replace(regexp_replace(" + col
        + f", '{EMAIL_RE}', '<EMAIL>', 'g')"
        + f", '{PHONE_RE}', '<PHONE>', 'g')"
        + f", '{IP_RE}', '<IP>', 'g')"
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document containing PII: span counts by type and a digest of
    the redacted text (proving the rewrite, not just the detection)."""
    docs = _with_pii(spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id"))
    t = F.col("text")
    counted = docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IP_RE)).cast("long").alias("n_ips"),
        hash60(_redact(t)).alias("redacted_hash"),
    )
    return counted.filter(
        F.col("n_emails") + F.col("n_phones") + F.col("n_ips") > 0
    )


PII_SCRUB_SQL = f"""
WITH pii AS (SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents),
counted AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
               AS n_phones,
           CAST(len(regexp_extract_all(text, '{IP_RE}')) AS BIGINT)
               AS n_ips,
           {hash60_sql(_redact_sql('text'))} AS redacted_hash
    FROM pii
)
SELECT * FROM counted WHERE n_emails + n_phones + n_ips > 0
"""


def pii_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang): documents holding PII and span totals by type
    — the report a release review reads before a corpus ships."""
    docs = _with_pii(spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id"))
    t = F.col("text")
    per_doc = docs.select(
        "source",
        "lang",
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("ne"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("np"),
        F.regexp_count(t, F.lit(IP_RE)).alias("ni"),
    )
    return per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(((F.col("ne") + F.col("np") + F.col("ni")) > 0).cast("int"))
        .cast("long")
        .alias("docs_with_pii"),
        F.sum("ne").cast("long").alias("total_emails"),
        F.sum("np").cast("long").alias("total_phones"),
        F.sum("ni").cast("long").alias("total_ips"),
    )


PII_SUMMARY_SQL = f"""
WITH pii AS (
    SELECT doc_id, source, lang, {_PII_TEXT_SQL} AS text FROM documents
),
per_doc AS (
    SELECT source, lang,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne,
           len(regexp_extract_all(text, '{PHONE_RE}')) AS np,
           len(regexp_extract_all(text, '{IP_RE}')) AS ni
    FROM pii
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_pii,
       CAST(SUM(ne) AS BIGINT) AS total_emails,
       CAST(SUM(np) AS BIGINT) AS total_phones,
       CAST(SUM(ni) AS BIGINT) AS total_ips
FROM per_doc
GROUP BY source, lang
"""


QUERIES: dict[str, Query] = {
    "pii_scrub": Query(
        pii_scrub,
        PII_SCRUB_SQL,
        "typed PII redaction with byte-exact rewrite digest (zero-exchange map)",
    ),
    "pii_summary": Query(
        pii_summary,
        PII_SUMMARY_SQL,
        "per (source, lang) PII span totals — corpus release report",
    ),
}
