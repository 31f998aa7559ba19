"""clear_session_caches(): eviction semantics for the session-scoped
memo dicts (and the embedding broadcast's custom clear hook)."""

from __future__ import annotations

import os

from simple_map_reduce_ruuner_spark.sources import tables
from simple_map_reduce_ruuner_spark.sources.tables import (
    clear_session_caches,
    session_cache,
)


def test_clear_session_caches_by_dataset_and_global(spark, sf_dir, tmp_path):
    other_dir = str(tmp_path)
    cache: dict = {}
    df = spark.range(3)
    session_cache(cache, spark, sf_dir, lambda: df, checkpoint=False)
    session_cache(cache, spark, other_dir, lambda: df, checkpoint=False)
    assert len(cache) == 2
    assert any(c is cache for c in tables._REGISTERED_CACHES)

    # dataset-scoped eviction drops only that sf_dir's key
    n = clear_session_caches(sf_dir)
    assert n >= 1
    assert len(cache) == 1
    (key,) = cache
    assert key[1] == os.path.realpath(other_dir)

    # a later call rebuilds the evicted entry
    session_cache(cache, spark, sf_dir, lambda: df, checkpoint=False)
    assert len(cache) == 2

    # global clear empties every registered cache
    clear_session_caches()
    assert not cache


def test_clear_hook_runs_and_emb_cache_is_registered(spark, sf_dir):
    """The embedding broadcast cache has non-(app, sf_dir) keys, so it is
    cleared via a registered hook rather than the generic dict sweep."""
    from simple_map_reduce_ruuner_spark.operators import dedup

    assert any(
        h is dedup._clear_emb_build_cache for h in tables._CLEAR_HOOKS
    )
    # Build the broadcast by running the query plan once at sf_dir, then
    # clear that dataset and observe the cache entry go away.
    dedup.neardup_embedding(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    app = spark.sparkContext.applicationId
    assert any(k[0] == app for k in dedup._EMB_BUILD_CACHE)
    clear_session_caches(sf_dir)
    assert not any(k[0] == app for k in dedup._EMB_BUILD_CACHE)
