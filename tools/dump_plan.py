#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries into plans/<tag>/.

Usage: python tools/dump_plan.py --tag r15 --suffix before q1 q2 ...
Writes plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
files the judge checks plan claims against).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_ruuner_spark.registry import all_queries
from simple_map_reduce_ruuner_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plan")
    queries = all_queries()
    for name in args.names:
        df = queries[name].fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
