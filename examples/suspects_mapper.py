#!/usr/bin/env python
"""Example external mapper for the suspects workload (stdin/stdout).

Per-chunk partial collection: key `name-family-year` → set of cities
seen in this chunk. Emits `key city1 city2 ...` lines for the reducer to
re-union — the partial-set contract the reference workload follows.
Own implementation for the pipe contract.
"""
import sys

partial: dict[str, set] = {}
for line in sys.stdin:
    parts = line.split()
    if len(parts) != 4:
        continue
    name, family, city, year = parts
    key = f"{name}-{family}-{year}"
    partial.setdefault(key, set()).add(city)
for key, cities in partial.items():
    sys.stdout.write(key + " " + " ".join(cities) + "\n")
