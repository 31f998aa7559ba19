#!/usr/bin/env python
"""Sequential-recurrence decade probe (r15 verdict item 3).

The two recurrence kernels — `throttle_suppress` (greedy cooldown
chain) and `ewma_value` (EWMA over own output) — run as group-boundary
mapInPandas scans whose inner loop is per-element Python. throttle had
a committed 100× number (16×, r13); `ewma_value` had NONE, and at
100 TB the interpreter-speed loop is the first thing to want a rows/s
figure for. This probe measures BOTH kernels at 1×/10×/100×/1000×
events (user-offset replicas: key count scales, per-key chain length
stays constant — the production shape where users multiply, histories
don't).

It also times a VECTORIZED-WITHIN-RUN ewma variant (numpy closed-form
over per-user segments) purely as a measurement arm: that form changes
the IEEE operation order (powers of 7/8 instead of the sequential
fold), so it is NOT bit-parity-safe against the recursive-CTE oracle —
if the sequential loop holds up at scale, the measured rationale for
keeping it is the artifact; if it dominates, the trade is quantified.

Usage: python tools/recurrence_scale_probe.py [--decades 1,10,100,1000]
Writes RECURRENCE_SCALE_r15.json at the repo root.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
USER_OFFSET = 100_000_000
EVENT_OFFSET = 1_000_000_000


def staged_events_dir(spark, ev, k, work):
    from pyspark.sql import functions as F

    scaled = (
        ev.crossJoin(F.broadcast(spark.range(k).withColumnRenamed("id", "r")))
        .withColumn("user_id", F.col("user_id") + F.col("r") * F.lit(USER_OFFSET))
        .withColumn(
            "event_id", F.col("event_id") + F.col("r") * F.lit(EVENT_OFFSET)
        )
        .drop("r")
    )
    sf_like = work / "sf"
    sf_like.mkdir()
    scaled.write.parquet(str(sf_like / "events.parquet"))
    return str(sf_like)


def timed_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ewma_vectorized(spark, sf_dir):
    """Measurement arm only (NOT registered, NOT parity-safe): per-user
    segments vectorized with the closed form
    s_t = (7/8)^t·y_0 + Σ_{i=1..t} (y_i/8)·(7/8)^(t-i), computed per
    Arrow batch with cumulative products — same keyed scan shape, no
    per-element Python loop. Rounding differs from the sequential fold
    in the last ulps, which is exactly why the registered operator
    keeps the loop."""
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
    )
    par = spark.sparkContext.defaultParallelism

    def kernel(batches):
        import numpy as np
        import pandas as pd

        a = 7.0 / 8.0
        carry_key = None
        carry_s = 0.0
        for pdf in batches:
            u = pdf["user_id"].to_numpy()
            eid = pdf["event_id"].to_numpy()
            y = pdf["cents"].to_numpy(dtype="float64")
            n = len(u)
            if n == 0:
                continue
            starts = np.empty(n, dtype=bool)
            starts[0] = u[0] != carry_key
            starts[1:] = u[1:] != u[:-1]
            seg_starts = np.flatnonzero(starts)
            out = np.empty(n, dtype="float64")
            # Python per SEGMENT (≈rows/chain_len iterations), numpy
            # within. Continuation of the carried state (rows before
            # the first fresh segment): s_q = a^(q+1)·carry
            # + Σ_{r≤q} (y_r/8)·a^(q-r)  =  p_q·(carry + cumsum(inv))
            head = seg_starts[0] if len(seg_starts) else n
            if head > 0:
                p = a ** np.arange(1, head + 1)
                inv = (y[:head] / 8.0) / p
                out[:head] = p * (carry_s + np.cumsum(inv))
            # fresh segments: s_0 = y_0; s_q = p_q·(y_0 + cumsum(inv))
            for j, lo in enumerate(seg_starts):
                hi = seg_starts[j + 1] if j + 1 < len(seg_starts) else n
                m = hi - lo
                p = a ** np.arange(m)
                inv = np.empty(m)
                inv[0] = y[lo]
                if m > 1:
                    inv[1:] = (y[lo + 1 : hi] / 8.0) / p[1:]
                out[lo:hi] = p * np.cumsum(inv)
            carry_key = u[-1]
            carry_s = float(out[-1])
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(u, dtype="int64"),
                    "event_id": pd.Series(eid, dtype="int64"),
                    "ewma_cents": pd.Series(out),
                }
            )

    return (
        ev.repartition(par, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(kernel, "user_id long, event_id long, ewma_cents double")
    )


def main() -> int:
    args = sys.argv[1:]
    decades = (
        [int(x) for x in args[args.index("--decades") + 1].split(",")]
        if "--decades" in args
        else [1, 10, 100, 1000]
    )

    from pyspark.sql import functions as F  # noqa: F401

    from simple_map_reduce_ruuner_spark.operators.timeseries import (
        ewma_value,
        throttle_suppress,
    )
    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    spark = get_spark(
        app_name="smrr-recurrence-scale",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, SF_DIR, "events")
    base_rows = ev.count()

    results: dict = {}
    for k in decades:
        work = pathlib.Path(tempfile.mkdtemp(prefix=f"recurrence_{k}x_"))
        sf_like = staged_events_dir(spark, ev, k, work)
        n = base_rows * k
        row: dict = {"input_rows": n}
        for name, fn in (
            ("ewma_value", ewma_value),
            ("ewma_vectorized_arm", ewma_vectorized),
            ("throttle_suppress", throttle_suppress),
        ):
            df = fn(spark, sf_like)
            timed_noop(df)  # codegen/scan warm-up rep
            wall = min(timed_noop(df), timed_noop(df))
            row[name] = {"wall_sec": round(wall, 2), "rows_per_sec": round(n / wall)}
        if k == 1:
            # the timing of a wrong kernel is worthless: at the base
            # decade the vectorized arm's full output is checked
            # against the registered operator — near-agreement (it is
            # NOT bit-parity by design: the closed form reorders the
            # IEEE ops) plus the measured share of bit-identical rows,
            # both committed in the artifact (review-found: an earlier
            # draft promised this check in a comment without doing it)
            a = {
                (r["user_id"], r["event_id"]): r["ewma_cents"]
                for r in ewma_value(spark, sf_like).collect()
            }
            b = {
                (r["user_id"], r["event_id"]): r["ewma_cents"]
                for r in ewma_vectorized(spark, sf_like).collect()
            }
            assert set(a) == set(b), "vectorized arm row set mismatch"
            worst = max(
                abs(a[key] - b[key]) / max(1.0, abs(a[key])) for key in a
            )
            assert worst < 1e-9, f"vectorized arm diverges: {worst}"
            row["vectorized_arm_check"] = {
                "rows": len(a),
                "worst_rel_err": float(f"{worst:.3e}"),
                "bit_identical_rows": sum(1 for key in a if a[key] == b[key]),
            }
        results[f"{k}x"] = row
        print(f"{k}x: {row}", flush=True)
        shutil.rmtree(work, ignore_errors=True)

    runs = {k: r for k, r in results.items()}
    doc = {
        "kernels": "ewma_value + throttle_suppress (registered, sequential "
        "Python loop, bit-parity with recursive-CTE oracles) and an "
        "UNREGISTERED vectorized ewma measurement arm (closed form, not "
        "parity-safe)",
        "scaling": "user-offset replicas: keys x k, per-key chain length "
        "constant (the production shape)",
        "base_sf_dir": SF_DIR,
        "base_rows": base_rows,
        "runs": runs,
    }
    out = REPO / "RECURRENCE_SCALE_r15.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
