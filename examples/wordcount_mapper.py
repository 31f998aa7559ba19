#!/usr/bin/env python
"""Example external mapper (stdin/stdout pipe contract).

Computes per-chunk partial word counts — the combiner-style contract the
reference's example mappers follow (each mapper pre-aggregates its whole
chunk before emitting). Own implementation; not derived from the
reference's C++ example.
"""
import sys
from collections import Counter

counts: Counter = Counter()
for line in sys.stdin:
    for tok in line.lower().split():
        counts[tok] += 1
for word, n in counts.items():
    sys.stdout.write(f"{word} {n}\n")
