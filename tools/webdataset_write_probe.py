#!/usr/bin/env python
"""WebDataset WRITE path at 10x (r13 verdict item 7).

``tar_shard_members`` (codecs.py) proves the READ side of the
WebDataset story — this probe measures the WRITER: the 10x documents
corpus packed into size-bounded POSIX ustar shards, the shape every
large-scale training-data pipeline ships (shards of ~100 MB-1 GB on
object storage; scaled here to a 2 MiB target the same way every probe
scales its knobs).

Plan shape is the 100 TB one: per-PARTITION packing in a single
mapInPandas pass — zero exchanges, no global coordination; each writer
task packs its own slice into shards and emits (shard, members, bytes,
tar). That is exactly how real WebDataset writers operate (N writers x
independent shard sequences); the cost is one underfull tail shard per
partition, measured below as waste.

Validation: stdlib ``tarfile`` (genuine third-party reader) opens
sampled shards and the member census must cover every doc exactly once.

Usage: python tools/webdataset_write_probe.py [--reps 3]
Writes WEBDATASET_WRITE_r13.json at the repo root.
"""

from __future__ import annotations

import io
import json
import pathlib
import shutil
import sys
import tarfile
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DOCS10X = REPO / ".scaledata" / "docs10x"
TARGET_BYTES = 2 * 1024 * 1024  # probe-scale stand-in for ~100 MB-1 GB


def shard_writer_fn(target_bytes: int):
    """mapInPandas kernel: pack each partition's docs into size-bounded
    ustar shards. Self-contained closure (executor pickling contract —
    see multimodal._ppm_encode_fn); ustar layout matches codecs'
    _tar_encode_fn and is validated against stdlib tarfile."""

    def write(batches):
        import pandas as pd

        def header(name: str, size: int) -> bytes:
            h = bytearray(512)
            nb = name.encode()
            h[0 : len(nb)] = nb
            h[100:108] = b"0000644\x00"
            h[108:116] = b"0000000\x00"
            h[116:124] = b"0000000\x00"
            h[124:136] = f"{size:011o}\x00".encode()
            h[136:148] = b"00000000000\x00"
            h[148:156] = b"        "  # checksum placeholder = spaces
            h[156] = 0x30  # typeflag '0'
            h[257:263] = b"ustar\x00"
            h[263:265] = b"00"
            chk = sum(h)
            h[148:156] = f"{chk:06o}\x00 ".encode()
            return bytes(h)

        def member(name: str, data: bytes) -> bytes:
            pad = (512 - len(data) % 512) % 512
            return header(name, len(data)) + data + b"\x00" * pad

        for pdf in batches:
            out_rows = []
            buf = io.BytesIO()
            n_members = 0
            payload_bytes = 0
            seq = 0

            def flush(pid: int):
                nonlocal buf, n_members, payload_bytes, seq
                if n_members == 0:
                    return
                buf.write(b"\x00" * 1024)  # end-of-archive marker
                tar = buf.getvalue()
                out_rows.append(
                    {
                        "shard": f"p{pid:05d}-{seq:05d}",
                        "n_members": n_members,
                        "payload_bytes": payload_bytes,
                        "tar_bytes": len(tar),
                        "tar": tar,
                    }
                )
                buf, n_members, payload_bytes, seq = (
                    io.BytesIO(), 0, 0, seq + 1,
                )

            pid = int(pdf["doc_id"].iloc[0]) % 100_000 if len(pdf) else 0
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode()
                buf.write(member(f"{int(doc_id):012d}.txt", data))
                n_members += 1
                payload_bytes += len(data)
                if buf.tell() >= target_bytes:
                    flush(pid)
            flush(pid)
            yield pd.DataFrame(
                out_rows,
                columns=["shard", "n_members", "payload_bytes", "tar_bytes", "tar"],
            )

    return write


def main() -> int:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 3
    assert DOCS10X.is_dir(), f"{DOCS10X} missing — run tools/make_scale_data.py"

    import numpy as np

    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    spark = get_spark(app_name="smrr-wds-write", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, str(DOCS10X), "documents").select("doc_id", "text")
    n_docs = docs.count()
    # second arm: the same corpus staged as 32 input files (how a 100 TB
    # corpus actually arrives) so the N-independent-writers parallelism
    # is measured; staging is excluded from the timed pass and the
    # packing pass itself stays zero-exchange in both arms
    stage32 = pathlib.Path(tempfile.mkdtemp(prefix="wds_in32_")) / "documents.parquet"
    docs.repartition(32).write.parquet(str(stage32))
    docs32 = spark.read.parquet(str(stage32)).select("doc_id", "text")

    walls, walls32 = [], []
    out_dir = None
    for rep in range(reps):
        work = pathlib.Path(tempfile.mkdtemp(prefix="wds_write_"))
        t0 = time.perf_counter()
        shards = docs.mapInPandas(
            shard_writer_fn(TARGET_BYTES),
            "shard string, n_members long, payload_bytes long, "
            "tar_bytes long, tar binary",
        )
        shards.write.parquet(str(work / "shards"))
        walls.append(time.perf_counter() - t0)
        t1 = time.perf_counter()
        docs32.mapInPandas(
            shard_writer_fn(TARGET_BYTES),
            "shard string, n_members long, payload_bytes long, "
            "tar_bytes long, tar binary",
        ).write.parquet(str(work / "shards32"))
        walls32.append(time.perf_counter() - t1)
        print(f"rep {rep}: 2-part {walls[-1]:.2f}s / 32-part {walls32[-1]:.2f}s", flush=True)
        if rep < reps - 1:
            shutil.rmtree(work, ignore_errors=True)
        else:
            out_dir = work

    # ---- validation + distribution on the last rep's output ----------
    meta = (
        spark.read.parquet(str(out_dir / "shards"))
        .select("shard", "n_members", "payload_bytes", "tar_bytes")
        .toPandas()
    )
    total_members = int(meta.n_members.sum())
    assert total_members == n_docs, (total_members, n_docs)
    sizes = meta.tar_bytes.to_numpy()
    # third-party read-back: stdlib tarfile over 3 sampled shards, and
    # the member-name census across ALL shards must be exactly the docs
    full = spark.read.parquet(str(out_dir / "shards")).toPandas()
    names = set()
    rng = np.random.RandomState(7)
    sample = rng.choice(len(full), size=min(3, len(full)), replace=False)
    for i, row in full.iterrows():
        with tarfile.open(fileobj=io.BytesIO(bytes(row.tar))) as tf:
            members = tf.getmembers()
            assert len(members) == row.n_members, row.shard
            if i in sample:  # deep-check payload sizes on the sample
                assert sum(m.size for m in members) == row.payload_bytes
            names.update(m.name for m in members)
    assert len(names) == n_docs, (len(names), n_docs)

    plan = shards._sc is not None and "Exchange" not in (
        shards._jdf.queryExecution().executedPlan().toString()
    )
    med = float(np.median(walls))
    doc = {
        "input": str(DOCS10X),
        "n_docs": n_docs,
        "target_shard_bytes": TARGET_BYTES,
        "reps_sec": [round(w, 2) for w in walls],
        "median_sec": round(med, 2),
        "median_sec_32_input_files": round(float(np.median(walls32)), 2),
        "payload_mb_per_sec_32_input_files": round(
            float(meta.payload_bytes.sum()) / 1e6 / float(np.median(walls32)), 1
        ),
        "docs_per_sec": round(n_docs / med),
        "payload_mb_per_sec": round(
            float(meta.payload_bytes.sum()) / 1e6 / med, 1
        ),
        "n_shards": int(len(meta)),
        "shard_size_bytes": {
            "min": int(sizes.min()),
            "p50": int(np.percentile(sizes, 50)),
            "p90": int(np.percentile(sizes, 90)),
            "max": int(sizes.max()),
        },
        "pct_shards_within_10pct_of_target": round(
            float(
                (abs(sizes - TARGET_BYTES) <= 0.1 * TARGET_BYTES).mean() * 100
            ),
            1,
        ),
        "tail_waste_pct": round(
            float(100.0 * (1 - sizes.sum() / (len(sizes) * max(sizes)))), 1
        ),
        "zero_exchange_plan": bool(plan),
        "third_party_validation": (
            "stdlib tarfile opened every shard; member counts match, "
            "sampled payload sizes match, member-name census covers "
            f"all {n_docs} docs exactly once"
        ),
        "method": (
            "per-partition size-bounded ustar packing in one mapInPandas "
            "pass (zero exchanges — the N-independent-writers shape real "
            "WebDataset pipelines use); one underfull tail shard per "
            "partition is the measured waste"
        ),
    }
    path = REPO / "WEBDATASET_WRITE_r13.json"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}: {doc['median_sec']}s, {doc['n_shards']} shards")
    shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
