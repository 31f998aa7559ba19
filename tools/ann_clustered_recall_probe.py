#!/usr/bin/env python
"""Re-run ann_recall_report on CLUSTERED embeddings (r11 verdict item 6).

The committed "IVF for retrieval, LSH for dedup" recommendation rested
on the driver's near-uniform synthetic vectors, where hyperplane LSH has
nothing to bucket on (0-10% recall by construction). Real embedding
tables are clustered. This probe synthesizes a mixture-of-Gaussians
table with the SAME schema/row-count as sf0.1's embeddings
(vec_id int64, embedding array<float> dim 64, label int32 = component
id; 10 components, within-cluster std sigma times the center scale) and
re-measures recall@10 for both ANN paths at several cluster tightnesses,
uniform included as the sigma=inf contrast.

Everything runs through the PRODUCTION operators (ann_recall_report →
bruteforce/LSH/IVF) — the probe only swaps the input directory.

Writes ANN_RECALL_CLUSTERED_r12.json at the repo root.
"""
from __future__ import annotations

import json
import os
import pathlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

UNIFORM = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64
N_COMPONENTS = 10
SIGMAS = [0.2, 0.5, 1.0]  # within-cluster std, centers ~ N(0, I)


def make_clustered(dst: pathlib.Path, n_rows: int, sigma: float) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    path = dst / "embeddings.parquet"
    if path.exists():
        return
    rng = np.random.RandomState(20260815 + int(sigma * 100))
    centers = rng.standard_normal((N_COMPONENTS, DIM))
    labels = rng.randint(0, N_COMPONENTS, n_rows)
    vecs = centers[labels] + sigma * rng.standard_normal((n_rows, DIM))
    table = pa.table(
        {
            "vec_id": pa.array(range(n_rows), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, path)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from simple_map_reduce_ruuner_spark.operators.similarity import (
        ann_recall_report,
    )

    n_rows = pq.ParquetFile(f"{UNIFORM}/embeddings.parquet").metadata.num_rows
    dirs = {"uniform_sf0.1": UNIFORM}
    for sigma in SIGMAS:
        d = REPO / ".scaledata" / f"emb_clustered_s{int(sigma * 100):03d}"
        make_clustered(d, n_rows, sigma)
        dirs[f"clustered_sigma_{sigma}"] = str(d)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .appName("ann-clustered-recall")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for name, d in dirs.items():
        rep = (
            ann_recall_report(spark, d)
            .agg(
                F.avg("lsh_recall_milli").alias("lsh"),
                F.avg("ivf_recall_milli").alias("ivf"),
                F.min("lsh_recall_milli").alias("lsh_min"),
                F.min("ivf_recall_milli").alias("ivf_min"),
            )
            .collect()[0]
        )
        out[name] = {
            "lsh_recall_mean_milli": round(rep["lsh"]),
            "ivf_recall_mean_milli": round(rep["ivf"]),
            "lsh_recall_min_milli": int(rep["lsh_min"]),
            "ivf_recall_min_milli": int(rep["ivf_min"]),
        }
        print(name, out[name], flush=True)

    doc = {
        "method": (
            "production ann_recall_report (bruteforce ground truth vs "
            "LSH and IVF paths, recall@10 over 5 queries) re-run on "
            "mixture-of-Gaussians tables: 10 components in 64-dim, "
            "centers ~ N(0,I), within-cluster std sigma; same schema "
            "and row count as the uniform sf0.1 table (the committed "
            "baseline row)"
        ),
        "n_rows": n_rows,
        "recall": out,
    }
    with open(REPO / "ANN_RECALL_CLUSTERED_r12.json", "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print("wrote ANN_RECALL_CLUSTERED_r12.json")
    spark.stop()


if __name__ == "__main__":
    main()
