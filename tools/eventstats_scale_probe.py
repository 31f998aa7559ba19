#!/usr/bin/env python
"""Decade probe for the session-2 event-analytics additions:
`cusum_changepoint`, `mad_outliers`, `session_trigrams`.

Same replication scheme as the recurrence probe (user-offset replicas
of the sf0.1 events table staged to parquet once per decade): user
count scales ×k, per-user history stays constant, and — the axis that
matters for the two per-type statistics — each event_type's series
also grows ×k, since the type alphabet is fixed at 5.

What to read off the artifact, beyond "is it linear":
- cusum's window stack runs inside ONE task per event_type (the
  exchange key has cardinality 5), so its wall clock is bounded by the
  LONGEST type series on one core, not by the cluster — the honest
  per-series parallelism ceiling of any ordered-prefix statistic. The
  probe publishes rows/s so that ceiling is a measured number.
- mad_outliers is two percentile aggregates + a ckpt'd census (no
  ordered window), so it should scale with cores, not series length.
- session_trigrams is user-keyed (cardinality scales with the data) —
  the fully parallel member, the control for the other two.

Usage: python tools/eventstats_scale_probe.py [--decades 1,10,100]
Writes EVENTSTATS_SCALE_r15.json at the repo root.
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
sys.path.insert(0, str(REPO / "tools"))

from recurrence_scale_probe import staged_events_dir, timed_noop  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPS = 2


def main() -> int:
    args = sys.argv[1:]
    decades = (
        [int(x) for x in args[args.index("--decades") + 1].split(",")]
        if "--decades" in args
        else [1, 10, 100]
    )

    from simple_map_reduce_ruuner_spark.operators.behavior import (
        session_trigrams,
    )
    from simple_map_reduce_ruuner_spark.operators.curation import mad_outliers
    from simple_map_reduce_ruuner_spark.operators.timeseries import (
        cusum_changepoint,
    )
    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    spark = get_spark(app_name="eventstats-scale-probe")
    ops = {
        "cusum_changepoint": cusum_changepoint,
        "mad_outliers": mad_outliers,
        "session_trigrams": session_trigrams,
    }
    # warm codegen once at the base scale
    for fn in ops.values():
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    base_rows = load_table(spark, SF_DIR, "events").count()
    rows_per_decade: dict[int, int] = {}
    results: dict[str, dict[str, dict]] = {n: {} for n in ops}
    for k in decades:
        work = pathlib.Path(tempfile.mkdtemp(prefix=f"smrr_evscale_{k}x_"))
        try:
            sf_like = staged_events_dir(
                spark, load_table(spark, SF_DIR, "events"), k, work
            )
            rows = base_rows * k
            rows_per_decade[k] = rows
            for name, fn in ops.items():
                walls = [
                    round(timed_noop(fn(spark, sf_like)), 3)
                    for _ in range(REPS)
                ]
                best = min(walls)
                results[name][str(k)] = {
                    "rows": rows,
                    "wall_s": walls,
                    "best_s": best,
                    "rows_per_s": int(rows / best) if best > 0 else None,
                }
                print(f"{k}x {name}: {walls} ({rows} rows)", flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    doc = {
        "sf": SF_DIR,
        "decades": decades,
        "base_rows": base_rows,
        "reps_per_point": REPS,
        "stat": "best of reps (steal-robust)",
        "results": results,
        "scaling_ratio_vs_rows": {
            name: {
                str(k): round(
                    (res[str(k)]["best_s"] / res[str(decades[0])]["best_s"])
                    / (k / decades[0]),
                    3,
                )
                for k in decades
                if res.get(str(k), {}).get("best_s", 0) > 0
                and res.get(str(decades[0]), {}).get("best_s", 0) > 0
            }
            for name, res in results.items()
        },
    }
    out = REPO / "EVENTSTATS_SCALE_r15.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps({"wrote": str(out)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
