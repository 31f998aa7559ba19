#!/usr/bin/env python
"""ANN recall/throughput trade-off curve at the clustered decades
(r13 verdict item 8).

ANN_RECALL_CLUSTERED_r12.json measured recall at ONE operating point
(N_CELLS=16, NPROBE=2) on 2k vectors. This probe re-runs the PRODUCTION
IVF operator (ann_topk_ivf, now parameterized; registry defaults
unchanged) on mixture-of-Gaussians tables at 10x and 100x the sf0.1
embedding count, sweeping the bucket-probe count — recall@10 against
the brute-force anchor vs wall time per nprobe — so the trade-off a
100 TB deployment tunes (probe more cells = more recall, more scanned
corpus) is a committed curve, not a one-point claim. Cells are swept
too: the registry's fixed 16 and a sqrt(N)-scaled count (the Σ|cell|²
linearity rule from SCALE.md).

Writes ANN_RECALL_CURVE_r14.json at the repo root.

Usage: python tools/ann_recall_curve_probe.py [--scales 10,100]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE_ROWS = 2000  # sf0.1 embeddings row count
DIM = 64
N_COMPONENTS = 10
SIGMA = 0.5  # the middle tightness from the r12 probe
NPROBES = [1, 2, 4, 8]


def make_clustered(dst: pathlib.Path, n_rows: int) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    path = dst / "embeddings.parquet"
    if path.exists():
        return
    rng = np.random.RandomState(20260816)
    centers = rng.standard_normal((N_COMPONENTS, DIM))
    labels = rng.randint(0, N_COMPONENTS, n_rows)
    vecs = centers[labels] + SIGMA * rng.standard_normal((n_rows, DIM))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_rows), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        path,
    )


def main() -> int:
    args = sys.argv[1:]
    scales = (
        [int(x) for x in args[args.index("--scales") + 1].split(",")]
        if "--scales" in args
        else [10, 100]
    )

    from simple_map_reduce_ruuner_spark.operators.similarity import (
        TOP_K,
        ann_topk_bruteforce,
        ann_topk_ivf,
    )
    from simple_map_reduce_ruuner_spark.session import get_spark

    spark = get_spark(app_name="smrr-ann-curve", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "sigma": SIGMA,
        "n_components": N_COMPONENTS,
        "top_k": TOP_K,
        "scales": {},
    }
    for k in scales:
        n_rows = BASE_ROWS * k
        sf = REPO / ".scaledata" / f"emb_clustered_{k}x"
        make_clustered(sf, n_rows)
        truth = {
            (r.query_id, r.vec_id)
            for r in ann_topk_bruteforce(spark, str(sf)).collect()
        }
        n_queries = len({q for q, _ in truth})
        cell_counts = [16, max(16, int(round(n_rows**0.5)))]
        rows = []
        for n_cells in cell_counts:
            for nprobe in NPROBES:
                if nprobe > n_cells:
                    continue
                t0 = time.perf_counter()
                got = {
                    (r.query_id, r.vec_id)
                    for r in ann_topk_ivf(
                        spark, str(sf), n_cells=n_cells, nprobe=nprobe
                    ).collect()
                }
                wall = time.perf_counter() - t0
                hit = len(truth & got)
                rows.append(
                    {
                        "n_cells": n_cells,
                        "nprobe": nprobe,
                        "corpus_share_probed": round(nprobe / n_cells, 4),
                        "recall_at_10_milli": round(1000 * hit / len(truth)),
                        "wall_sec": round(wall, 2),
                    }
                )
                print(f"{k}x cells={n_cells} nprobe={nprobe}: {rows[-1]}")
        out["scales"][f"{k}x"] = {"n_rows": n_rows, "curve": rows}

    out["method"] = (
        "production ann_topk_ivf (parameterized n_cells/nprobe; registry "
        "defaults 16/2 unchanged) vs the brute-force anchor on "
        "mixture-of-Gaussians tables (10 components, sigma 0.5, same "
        "schema as sf0.1 embeddings); recall@10 over the 5-query set, "
        "one Spark wall-clock per operating point"
    )
    path = REPO / "ANN_RECALL_CURVE_r14.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
