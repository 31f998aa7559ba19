"""Independent (non-oracle) checks for the clustering and graph-projection
operators: brute-force Python reimplementations over the sf0.001 corpus.
The DuckDB oracles already replay the same *algorithms*; these tests
re-derive the answers from first principles (numpy/itertools over exact
Python ints) so an error shared by both SQL formulations would still be
caught.
"""

from __future__ import annotations

import itertools
import math

import pyarrow.parquet as pq

from simple_map_reduce_ruuner_spark.operators import behavior, clustering, graph


def _quantized_vectors(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    out = {}
    for vid, emb in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()):
        out[vid] = [math.floor(float(x) * clustering.QSCALE) for x in emb]
    return out


def _lloyd_reference(sf_dir):
    """Exact-integer reimplementation of the 2-round assignment in plain
    Python (big ints, no SQL)."""
    vecs = _quantized_vectors(sf_dir)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(cents):
        return {
            vid: min((d2(q, c), cid) for cid, c in cents.items())
            for vid, q in vecs.items()
        }

    seeds = {vid: vecs[vid] for vid in vecs if vid < clustering.K}
    first = assign(seeds)
    members: dict[int, list[int]] = {}
    for vid, (_, cid) in first.items():
        members.setdefault(cid, []).append(vid)
    trained = {}
    for cid, vids in members.items():
        n = len(vids)
        # Spark `div` / DuckDB `//` both truncate toward zero; Python //
        # floors, so negative sums need explicit truncation.
        trained[cid] = [
            int(sum(vecs[v][d] for v in vids) / n)
            if sum(vecs[v][d] for v in vids) < 0
            else sum(vecs[v][d] for v in vids) // n
            for d in range(clustering.DIM)
        ]
    return vecs, assign(trained)


def test_kmeans_census_matches_python_reimplementation(spark, sf_dir):
    vecs, final = _lloyd_reference(sf_dir)
    expected: dict[int, list[int]] = {}
    for _vid, (dist2, cid) in final.items():
        expected.setdefault(cid, []).append(dist2)
    got = {
        r.cluster_id: (r.n_vectors, r.mean_dist2)
        for r in clustering.kmeans_clusters(spark, sf_dir).collect()
    }
    assert sum(n for n, _ in got.values()) == len(vecs)
    for cid, dists in expected.items():
        n = len(dists)
        assert got[cid] == (n, sum(dists) // n), cid


def test_semdedup_pairs_match_brute_force(spark, sf_dir):
    vecs, final = _lloyd_reference(sf_dir)
    clusters: dict[int, list[int]] = {}
    for vid, (_, cid) in final.items():
        clusters.setdefault(cid, []).append(vid)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    expected = set()
    for vids in clusters.values():
        for a, b in itertools.combinations(sorted(vids), 2):
            dist = d2(vecs[a], vecs[b])
            if dist <= clustering.DIST2_MAX:
                expected.add((a, b, dist))
    got = {
        (r.vec_a, r.vec_b, r.dist2)
        for r in clustering.semdedup_pairs(spark, sf_dir).collect()
    }
    assert got == expected and len(got) > 0


def test_triangle_count_matches_brute_force(spark, sf_dir):
    from pyspark.sql import functions as F

    edges = [
        (r.s1, r.s2)
        for r in (
            graph._cotrading_counts(spark, sf_dir)
            .orderBy(F.col("shared_customers").desc(), "s1", "s2")
            .limit(graph.TRI_EDGES)
            .collect()
        )
    ]
    eset = set(edges)
    nodes = sorted({n for e in edges for n in e})
    brute = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    got = graph.cotrading_triangles(spark, sf_dir).collect()[0].triangles
    assert got == brute and got > 0


def test_event_transitions_conserve_counts(spark, sf_dir):
    rows = behavior.event_transitions(spark, sf_dir).collect()
    total = sum(r.transitions for r in rows)
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    users = t["user_id"].to_pylist()
    # every event except each user's last contributes exactly one bigram
    assert total == len(users) - len(set(users))
