#!/usr/bin/env python
"""AQE skew-join evidence on a hot LSH bucket (r13 verdict item 5).

SCALE.md claims "AQE skew-join splits hot buckets" for the banded
MinHash-LSH candidate self-join (dedup._neardup_minhash_lsh_plan) —
this probe MEASURES it instead of asserting it.

Setup: a synthetic documents corpus where 10% of docs are IDENTICAL
(one boilerplate cluster — the classic near-dup hot key): identical
text => identical shingle set => identical 16-perm signature => the
same (band, band_sig) bucket on EVERY band, so the self-join has one
bucket holding 10% of the corpus per band while every other bucket has
1-2 rows. Broadcast is disabled (the 100 TB sort-merge shape — a
broadcast join cannot skew-split and at fleet scale the banded side
exceeds any broadcast threshold).

A/B: identical session, identical advisory sizes, toggling ONLY
``spark.sql.adaptive.skewJoin.enabled``. The skew thresholds are
scaled to probe size (1 MiB advisory/threshold, factor 2) for the same
reason every scale probe scales its knobs: at 100 TB the hot bucket
crosses the 256 MiB default on its own; at probe scale we move the
threshold to the data rather than the data to the threshold.

Receipts: per-rep wall seconds (interleaved A/B), and the final
adaptive executed plan of one rep per arm — the skew arm must contain
a SortMergeJoin marked ``skew=true``, the control arm must not.

Usage: python tools/skew_split_probe.py [--reps 4]
Writes SKEW_SPLIT_r13.json at the repo root.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = 50_000
HOT_FRAC = 0.10


def main() -> int:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 4

    import numpy as np

    from simple_map_reduce_ruuner_spark.operators.dedup import (
        _neardup_minhash_lsh_plan,
    )
    from simple_map_reduce_ruuner_spark.session import get_spark

    spark = get_spark(app_name="smrr-skew-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    work = pathlib.Path(tempfile.mkdtemp(prefix="skew_probe_"))
    n_hot = int(N_DOCS * HOT_FRAC)
    rng = np.random.RandomState(13)
    words = [f"w{i:04d}" for i in range(5000)]
    hot_text = " ".join(words[i] for i in rng.randint(0, 5000, 40))
    rows = []
    for d in range(N_DOCS):
        if d < n_hot:
            text = hot_text  # one boilerplate cluster, identical shingles
        else:
            text = " ".join(words[i] for i in rng.randint(0, 5000, 40))
        rows.append((d, text, "en", "synth", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(8).write.parquet(str(work / "documents.parquet"))
    print(f"staged {N_DOCS:,} docs ({n_hot:,} identical -> one hot bucket/band)")

    # the 100 TB SMJ shape + probe-scaled skew thresholds (same in BOTH
    # arms; only skewJoin.enabled differs)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # many shuffle partitions so the indivisible hot key stands out from
    # the base load (skew test is size > max(factor*median, threshold) on
    # COMPRESSED map-output bytes: the hot bucket's identical rows lz4 down
    # to tens of KB, so the base must be small enough not to mask them —
    # the same under-detection a real boilerplate cluster shows, which is
    # why thresholds must be sized against compressed shuffle bytes)
    spark.conf.set("spark.sql.shuffle.partitions", "1000")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def run_once(skew_on: bool) -> tuple[float, int, str]:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", "true" if skew_on else "false"
        )
        # collect through the DF's OWN QueryExecution so the captured
        # plan is the final adaptive one (df.count() builds a separate
        # QueryExecution and leaves this one isFinalPlan=false)
        df = _neardup_minhash_lsh_plan(spark, str(work)).groupBy().count()
        t0 = time.perf_counter()
        n = df.collect()[0][0]
        wall = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        return wall, n, plan

    out = {"skew_on": [], "skew_off": []}
    plans = {}
    n_pairs = None
    for rep in range(reps):
        for arm, flag in (("skew_on", True), ("skew_off", False)):
            wall, n, plan = run_once(flag)
            out[arm].append(round(wall, 2))
            plans.setdefault(arm, plan)
            if n_pairs is None:
                n_pairs = n
            assert n == n_pairs, "arms disagree on candidate-pair count"
            print(f"rep {rep} {arm}: {wall:.2f}s rows={n:,}", flush=True)

    skew_marker_on = "skew=true" in plans["skew_on"]
    skew_marker_off = "skew=true" in plans["skew_off"]
    med = lambda xs: sorted(xs)[len(xs) // 2]
    doc = {
        "n_docs": N_DOCS,
        "hot_cluster_docs": n_hot,
        "candidate_pairs": n_pairs,
        "reps": out,
        "median_sec": {k: med(v) for k, v in out.items()},
        "speedup_skew_on": round(med(out["skew_off"]) / med(out["skew_on"]), 2),
        "plan_skew_marker": {"skew_on": skew_marker_on, "skew_off": skew_marker_off},
        "thresholds": {
            "advisoryPartitionSizeInBytes": "16k (both arms)",
            "skewedPartitionThresholdInBytes": "16k",
            "skewedPartitionFactor": 2,
            "shuffle_partitions": 1000,
            "autoBroadcastJoinThreshold": -1,
            "note": (
                "thresholds scaled to probe size; at 100 TB the hot bucket "
                "crosses the 256 MiB default on its own"
            ),
        },
        "method": (
            "banded MinHash-LSH candidate self-join over a synthetic corpus "
            "with a 10% identical-text cluster (one hot (band,band_sig) "
            "bucket per band); interleaved A/B reps toggling ONLY "
            "spark.sql.adaptive.skewJoin.enabled; equality of pair counts "
            "asserted across arms; final adaptive plans grepped for the "
            "SortMergeJoin skew=true marker"
        ),
    }
    if not (skew_marker_on and not skew_marker_off):
        print("DIAG skew_on plan:")
        print("\n".join(l for l in plans["skew_on"].splitlines()
                         if "Join" in l or "skew" in l)[:2000])
        raise AssertionError(("skew split did not fire", skew_marker_on, skew_marker_off))
    path = REPO / "SKEW_SPLIT_r13.json"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}: {doc['median_sec']} speedup={doc['speedup_skew_on']}")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
