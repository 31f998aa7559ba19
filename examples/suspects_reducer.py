#!/usr/bin/env python
"""Example external reducer for the suspects workload (stdin/stdout).

Re-unions the partial city sets per key and keeps keys with more than
10 distinct cities — the reference workload's HAVING threshold.
"""
import sys

merged: dict[str, set] = {}
for line in sys.stdin:
    parts = line.split()
    if not parts:
        continue
    merged.setdefault(parts[0], set()).update(parts[1:])
for key, cities in merged.items():
    if len(cities) > 10:
        sys.stdout.write(key + " " + " ".join(cities) + "\n")
