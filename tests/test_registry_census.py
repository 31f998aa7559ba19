"""Registry completeness guard: every operator/streaming module that
exposes a ``QUERIES`` dict must be wired into ``registry.all_queries()``.
The extension-loader pattern fails SILENTLY when a new module's loader
is forgotten (the queries simply never reach the driver gate), so this
test walks the packages on disk and diffs against the live registry.
"""

from __future__ import annotations

import importlib
import pkgutil

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
