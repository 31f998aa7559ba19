#!/usr/bin/env python
"""Example external reducer (stdin/stdout pipe contract).

Merges partial counts emitted by every mapper chunk: re-summing partials
is the algebraic-merge contract the reference's reducers follow.
"""
import sys
from collections import Counter

counts: Counter = Counter()
for line in sys.stdin:
    word, n = line.rsplit(" ", 1)
    counts[word] += int(n)
for word, n in counts.items():
    sys.stdout.write(f"{word} {n}\n")
