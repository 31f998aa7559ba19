"""Registry completeness guard: every operator/streaming module that
exposes a ``QUERIES`` dict must be wired into ``registry.all_queries()``.
The extension-loader pattern fails SILENTLY when a new module's loader
is forgotten (the queries simply never reach the driver gate), so this
test walks the packages on disk and diffs against the live registry.
"""

from __future__ import annotations

import importlib
import pkgutil
import pytest

from simple_map_reduce_ruuner_spark import operators, registry, streaming


def _module_query_names() -> set[str]:
    names: set[str] = set()
    for pkg in (operators, streaming):
        for info in pkgutil.iter_modules(pkg.__path__):
            mod = importlib.import_module(f"{pkg.__name__}.{info.name}")
            queries = getattr(mod, "QUERIES", None)
            if isinstance(queries, dict):
                names.update(queries)
    return names


def test_every_module_query_is_registered():
    on_disk = _module_query_names()
    registered = set(registry.all_queries())
    missing = on_disk - registered
    assert not missing, f"QUERIES defined but not reachable: {sorted(missing)}"


def test_every_oracle_belongs_to_a_query():
    qs = registry.all_queries()
    # Query dataclass pairs oracle with fn by construction; this guards
    # the __spark_entry__ projection instead.
    import __spark_entry__ as entry

    assert set(entry.oracle_sql()) <= set(entry.queries())
    # and the two known sketch queries are the ONLY oracle-less entries
    no_oracle = {n for n, q in qs.items() if q.oracle is None}
    assert no_oracle == {"approx_distinct_users", "approx_percentiles"}


def test_registry_md_census_is_current():
    """REGISTRY.md (the committed name → site → oracle-kind census) must
    match a live regeneration on its STABLE columns — a new/renamed/moved
    query without a census refresh fails here; run
    `python tools/registry_census.py --write`. The last-green column is
    driver-artifact-derived and rotates by design, so it is exempt: a
    fresh CORRECTNESS artifact landing between rounds must not redden
    the suite."""
    import pathlib
    import re
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root / "tools"))
    import registry_census

    live = {(n, s, k) for n, s, k, _g in registry_census.census_rows()}
    committed = set()
    row = re.compile(r"^\| (\S+) \| `([^`]+)` \| (sql|rows-only) \| ")
    for line in (root / "REGISTRY.md").read_text().splitlines():
        m = row.match(line)
        if m:
            committed.add(m.groups())
    assert committed == live, (
        f"REGISTRY.md stale: regenerate with tools/registry_census.py "
        f"--write (missing={sorted(live - committed)[:5]}, "
        f"extra={sorted(committed - live)[:5]})"
    )


def test_registry_md_last_green_column_not_older_than_artifacts():
    """The census header stamps which CORRECTNESS_r*.json set its
    last-green column was derived from; that stamp must cite the NEWEST
    artifact the BUILDER could have seen. The driver writes the current
    round's CORRECTNESS_r{N}.json AFTER the builder's final commit, so
    at judge time the newest file is legitimately one round ahead of the
    stamp — but ONLY while that newest artifact is not yet committed
    (r10 accepted newest-1 unconditionally, which made a genuinely
    one-round-stale census indistinguishable from the in-flight-gate
    case; advice-found). Epoch rule: stamp == newest is current;
    stamp == newest - 1 is green iff CORRECTNESS_r{newest}.json is
    untracked/dirty in git (the driver's own in-flight gate for this
    round); anything else is a real staleness bug — regenerate with
    `python tools/registry_census.py --write`."""
    import pathlib
    import re
    import subprocess

    root = pathlib.Path(__file__).resolve().parent.parent
    newest = max(
        int(re.search(r"r(\d+)", p.name).group(1))
        for p in root.glob("CORRECTNESS_r*.json")
    )
    m = re.search(
        r"artifacts through r(\d+)", (root / "REGISTRY.md").read_text()
    )
    assert m, "REGISTRY.md lost its 'artifacts through rNN' stamp"
    stamped = int(m.group(1))
    if stamped == newest - 1:
        # legitimate only while the newest artifact postdates the
        # builder's last commit: untracked, or tracked-but-modified
        # (the driver overwrites in place on re-runs). `git status
        # --porcelain` covers both; empty output = clean+committed.
        name = f"CORRECTNESS_r{newest:02d}.json"
        try:
            dirty = subprocess.run(
                ["git", "status", "--porcelain", "--", name],
                cwd=root,
                capture_output=True,
                text=True,
                timeout=30,
            ).stdout.strip()
        except (OSError, subprocess.TimeoutExpired):
            # can't verify: make the unverified case VISIBLE instead of
            # silently passing the staleness assertion (ADVICE r11)
            pytest.skip("git unavailable — census staleness unverifiable")
        assert dirty, (
            f"REGISTRY.md derived from r{stamped} artifacts but "
            f"{name} is committed clean — the census is genuinely one "
            "round stale; regenerate with tools/registry_census.py --write"
        )
    else:
        assert stamped == newest, (
            f"REGISTRY.md derived from r{stamped} artifacts but "
            f"CORRECTNESS_r{newest:02d}.json exists (gap > 1 round) — "
            "regenerate with tools/registry_census.py --write"
        )


def test_tokenizer_literal_matches_spark_twin_and_never_drifts(spark):
    """The canonical DuckDB tokenizer literal (functions.text.TOKS_SQL)
    must (a) produce exactly what the Spark tokens() helper produces,
    and (b) be the ONLY whitespace-tokenizer shape appearing in any
    oracle string — a drifted inline copy silently breaks parity for
    just that operator (review-found duplication risk)."""
    import pathlib
    import re

    import duckdb

    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.functions.text import TOKS_SQL, tokens

    samples = ["Hello  World", "", "  tabs\tand\nnewlines  ", "MiXeD case x"]
    sdf = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [r.t for r in sdf.select(tokens(F.col("text")).alias("t")).collect()]
    want = [
        duckdb.sql(
            f"SELECT {TOKS_SQL} FROM (SELECT ? AS text)", params=[s]
        ).fetchone()[0]
        for s in samples
    ]
    assert got == want

    # grep-guard: every inline occurrence keeps the canonical core
    root = pathlib.Path(__file__).resolve().parent.parent
    core = re.compile(r"string_split_regex\(lower\(text\), '\\\\?s\+'\)")
    offenders = []
    for path in (root / "simple_map_reduce_ruuner_spark").rglob("*.py"):
        for n, line in enumerate(path.read_text().splitlines(), 1):
            if "string_split_regex" in line and not core.search(line):
                offenders.append(f"{path.name}:{n}: {line.strip()[:80]}")
    assert not offenders, offenders
