#!/usr/bin/env python
"""Generate a deterministic N× scale-up of a testdata sf directory, for
SCALE-CURVE measurement only (correctness gates always run on the
driver's own parquet).

Scheme: K replicas of every row with primary/foreign keys offset by
replica*KEY_OFFSET, so key CARDINALITY scales with the data (a naive
row-duplication would keep |keys| fixed and turn every groupBy into a
hot-key benchmark instead of a scale benchmark). Dimension keys
(customer/part/supplier) scale too, mirroring TPC-H's linear dims;
nation/region stay fixed like the spec's constant dims. Replica 0 is
the original data byte-for-byte.

Content columns that drive DEDUP/ANN selectivity cannot be copied
verbatim — 10 identical copies of every document would make near-dup
candidate pair counts grow quadratically in K, measuring the blowup of
an artificial duplicate farm rather than the operator's scaling. So
per replica ≥ 1: document text is deterministically word-shuffled
(seeded per (replica, doc_id) — token multiset, length and word-count
statistics are preserved exactly; shingle sets diverge), and embedding
vectors are redrawn from a seeded standard normal (unit-scaled like
the originals). Timestamps are left untouched: the time RANGE of a
workload does not grow with corpus size, so windows/sweeps see K× the
events per window — exactly the 100 TB shape.

Usage: python tools/make_scale_data.py SRC_DIR DST_DIR [K]
e.g.:  python tools/make_scale_data.py /root/testdata/sf0.1 \
           /root/repo/.scaledata/sf1 10
"""

from __future__ import annotations

import pathlib
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_OFFSET = 100_000_000  # > any sf0.1 key; replica i adds i*KEY_OFFSET

# table -> int64 key columns to offset per replica
_KEYED: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_FIXED = ["nation", "region"]


def _shuffle_words(text: str, seed: str) -> str:
    words = text.split()
    random.Random(seed).shuffle(words)
    return " ".join(words)


def _replica(name: str, table: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return table
    out = table
    for col in _KEYED[name]:
        idx = out.schema.get_field_index(col)
        shifted = pc.add(out.column(col), pa.scalar(i * KEY_OFFSET, pa.int64()))
        out = out.set_column(idx, out.schema.field(idx), shifted)
    if name == "documents":
        doc_ids = table.column("doc_id").to_pylist()
        texts = table.column("text").to_pylist()
        new = [
            _shuffle_words(t, f"{i}:{d}") if t else t
            for d, t in zip(doc_ids, texts)
        ]
        idx = out.schema.get_field_index("text")
        out = out.set_column(idx, out.schema.field(idx), pa.array(new, pa.string()))
    if name == "embeddings":
        dims = [len(v) for v in table.column("embedding").to_pylist()]
        rng = np.random.RandomState(1_000_003 * i + 17)
        vecs = [rng.standard_normal(d).astype(np.float32) for d in dims]
        idx = out.schema.get_field_index("embedding")
        out = out.set_column(
            idx,
            out.schema.field(idx),
            pa.array([v.tolist() for v in vecs], out.schema.field(idx).type),
        )
    return out


def make_scale_data(src: str, dst: str, k: int = 10) -> None:
    src_p, dst_p = pathlib.Path(src), pathlib.Path(dst)
    dst_p.mkdir(parents=True, exist_ok=True)
    for name in _FIXED:
        table = pq.read_table(src_p / f"{name}.parquet")
        pq.write_table(table, dst_p / f"{name}.parquet")
        print(f"{name}: {table.num_rows} rows (fixed dim)")
    for name in _KEYED:
        table = pq.read_table(src_p / f"{name}.parquet")
        reps = [_replica(name, table, i) for i in range(k)]
        big = pa.concat_tables(reps)
        assert big.schema.equals(table.schema), name
        pq.write_table(big, dst_p / f"{name}.parquet")
        print(f"{name}: {table.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_scale_data(src, dst, k)
