#!/usr/bin/env python
"""IVF build/probe recall curve (r15 verdict item 1, the "Done" gate).

ANN_RECALL_CURVE_r14.json showed the inline `ann_topk_ivf` would not be
deployed at scale: (a) the N×C assignment re-ran per invocation and
dominated wall clock at high C, and (b) the first-N quantizer's recall
fell to 0.78–0.88 at C≈sqrt(N). This probe re-runs the measurement on
the NEW build/probe split (`operators/ivf.py`) over the same clustered
tables (same generator/seed as the r14 probe, reused on disk):

- `build_ivf_index` timed ONCE per (table, C, n_iters) — the amortized
  pass (trained k-means centroids, postings partitioned by cell);
- per nprobe: PROBE-ONLY wall clock (the index is on disk), recall@10
  vs the brute-force anchor, and the measured corpus share probed
  (Σ probed-cell occupancy / N over the query set, read from the
  index, not estimated as nprobe/C — trained cells are not uniform);
- the r14 inline operator timed at the matching operating point, so
  the amortization is a measured ratio, not a claim.

Target from the verdict: recall@10 ≥ 0.9 at ≤ 2 % corpus probed with
the assignment amortized out, at C≈sqrt(N).

Usage: python tools/ivf_index_recall_probe.py [--scales 10,100]
Writes IVF_INDEX_RECALL_r15.json at the repo root.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from ann_recall_curve_probe import BASE_ROWS, make_clustered  # noqa: E402

NPROBES = [1, 2, 4, 8]
N_ITERS = [1, 2]


def main() -> int:
    args = sys.argv[1:]
    scales = (
        [int(x) for x in args[args.index("--scales") + 1].split(",")]
        if "--scales" in args
        else [10, 100]
    )

    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.operators import ivf
    from simple_map_reduce_ruuner_spark.operators.similarity import (
        TOP_K,
        ann_topk_bruteforce,
        ann_topk_ivf,
    )
    from simple_map_reduce_ruuner_spark.session import get_spark

    spark = get_spark(app_name="smrr-ivf-index-curve", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"top_k": TOP_K, "scales": {}}
    for k in scales:
        n_rows = BASE_ROWS * k
        sf = REPO / ".scaledata" / f"emb_clustered_{k}x"
        make_clustered(sf, n_rows)
        truth = {
            (r.query_id, r.vec_id)
            for r in ann_topk_bruteforce(spark, str(sf)).collect()
        }
        n_cells = max(16, int(round(n_rows**0.5)))
        rows = []
        for n_iters in N_ITERS:
            t0 = time.perf_counter()
            path = ivf.build_ivf_index(
                spark, str(sf), n_cells, rebuild=True, n_iters=n_iters
            )
            build_sec = time.perf_counter() - t0
            cents, post = ivf._read_index(spark, path)
            occupancy = {
                r["cell"]: r["n"]
                for r in post.groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            for nprobe in NPROBES:
                probed = ivf.probe_cells(spark, str(sf), cents, nprobe).collect()
                share = sum(occupancy.get(r["cell"], 0) for r in probed) / (
                    n_rows * len({r["query_id"] for r in probed})
                )
                t0 = time.perf_counter()
                got = {
                    (r.query_id, r.vec_id)
                    for r in ivf.ann_topk_ivf_indexed(
                        spark,
                        str(sf),
                        n_cells=n_cells,
                        nprobe=nprobe,
                        n_iters=n_iters,
                    ).collect()
                }
                probe_sec = time.perf_counter() - t0
                rows.append(
                    {
                        "n_cells": n_cells,
                        "n_iters": n_iters,
                        "nprobe": nprobe,
                        "build_sec": round(build_sec, 2),
                        "probe_sec": round(probe_sec, 2),
                        "corpus_share_probed": round(share, 4),
                        "recall_at_10_milli": round(
                            1000 * len(truth & got) / len(truth)
                        ),
                    }
                )
                print(f"{k}x iters={n_iters} nprobe={nprobe}: {rows[-1]}",
                      flush=True)
        # the r14 inline operator at the matching point, for the
        # amortization ratio (its wall includes the N×C assignment)
        t0 = time.perf_counter()
        ann_topk_ivf(spark, str(sf), n_cells=n_cells, nprobe=2).collect()
        inline_sec = time.perf_counter() - t0
        out["scales"][f"{k}x"] = {
            "n_rows": n_rows,
            "n_cells": n_cells,
            "inline_op_wall_sec_nprobe2": round(inline_sec, 2),
            "curve": rows,
        }

    ok = [
        r
        for s in out["scales"].values()
        for r in s["curve"]
        if r["recall_at_10_milli"] >= 900 and r["corpus_share_probed"] <= 0.02
    ]
    out["verdict_target_met"] = bool(ok)
    out["target"] = "recall@10 >= 0.9 at <= 2% corpus probed, C ~ sqrt(N)"
    path = REPO / "IVF_INDEX_RECALL_r15.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
