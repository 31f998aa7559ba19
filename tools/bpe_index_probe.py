#!/usr/bin/env python
"""BPE merge-table amortization receipt (the ivf-style "Done" gate for
operators/bpe_index.py).

BENCH_FULL_r15 flagged `bpe_encode_docs` (2.7 s at sf0.1) as the most
expensive r15 addition because it re-runs the k-iteration merge chain
per invocation by design (train+apply anchor). The materialized split
is the deployment shape; this probe measures, on the real sf tables:

- inline `bpe_encode_docs` wall (median of reps) — train+apply anchor;
- `build_bpe_merges` COLD build wall (rebuild=True) — the one-time pass;
- `bpe_encode_indexed` wall with the index on disk (median of reps) —
  what every later encode job pays;
- equality of the two encodes (count + full anti-join both ways), so
  the speedup is of the SAME answer.

Usage: python tools/bpe_index_probe.py [--sf /root/testdata/sf0.1]
Writes BPE_INDEX_AMORTIZATION_r15.json at the repo root.
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REPS = 3


def main() -> int:
    args = sys.argv[1:]
    sf = (
        args[args.index("--sf") + 1]
        if "--sf" in args
        else "/root/testdata/sf0.1"
    )

    from simple_map_reduce_ruuner_spark.operators import bpe_index, textlm
    from simple_map_reduce_ruuner_spark.session import get_spark

    spark = get_spark(app_name="bpe-index-probe")

    def wall(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    with tempfile.TemporaryDirectory(prefix="smrr_bpe_probe_") as base:
        # warm codegen/session on the small sf first (bench discipline)
        bpe_index.bpe_encode_indexed(
            spark, "/root/testdata/sf0.001", base_dir=base
        ).count()
        textlm.bpe_encode_docs(spark, "/root/testdata/sf0.001").count()

        inline = [
            wall(lambda: textlm.bpe_encode_docs(spark, sf).count())
            for _ in range(REPS)
        ]
        build_s = wall(
            lambda: bpe_index.build_bpe_merges(
                spark, sf, base_dir=base, rebuild=True
            )
        )
        probe = [
            wall(lambda: bpe_index.bpe_encode_indexed(spark, sf, base_dir=base).count())
            for _ in range(REPS)
        ]

        a = textlm.bpe_encode_docs(spark, sf)
        b = bpe_index.bpe_encode_indexed(spark, sf, base_dir=base)
        n_a, n_b = a.count(), b.count()
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    doc = {
        "sf": sf,
        "reps": REPS,
        "inline_encode_s": inline,
        "inline_encode_median_s": med(inline),
        "index_build_s": build_s,
        "indexed_encode_s": probe,
        "indexed_encode_median_s": med(probe),
        "amortized_speedup": round(med(inline) / med(probe), 2),
        "build_breakeven_encodes": round(
            build_s / max(med(inline) - med(probe), 1e-9), 1
        ),
        "rows": n_a,
        "rows_equal": n_a == n_b,
        "rows_differing": diff,
    }
    out = REPO / "BPE_INDEX_AMORTIZATION_r15.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
