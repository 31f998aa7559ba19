"""POSIX ustar shard kernels (codecs.tar_shard_members), driven
directly through the production factories — no Spark session needed.

Uniquely among the container formats, a third-party reader EXISTS in
this environment (stdlib tarfile), so the writer is validated against
it — not just against our own parser. The parser itself must verify
header checksums and the end-of-archive marker. Spark-level oracle
parity runs in the driver gate.
"""

from __future__ import annotations

import io
import tarfile

import numpy as np
import pandas as pd
import pytest

from simple_map_reduce_ruuner_spark.operators.codecs import (
    TAR_HEAD_BYTES,
    _tar_decode_fn,
    _tar_encode_fn,
)


def _decode(blobs: list[bytes], ids: list[int] | None = None) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": ids or list(range(len(blobs))), "tar": blobs})
    return pd.concat(list(_tar_decode_fn()([pdf])), ignore_index=True)


def _encode(payloads: list[bytes], ids: list[int]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": ids, "payload": payloads})
    return pd.concat(list(_tar_encode_fn()([pdf])), ignore_index=True)


def test_stdlib_tarfile_reads_our_shards():
    """Third-party interop: the stdlib tar reader must accept the
    writer's output byte-for-byte (names, sizes, contents)."""
    enc = _encode([b"interop check", b""], [5, 6])
    for row_id, payload in ((5, b"interop check"), (6, b"")):
        blob = bytes(enc[enc.doc_id == row_id]["tar"].iloc[0])
        tf = tarfile.open(fileobj=io.BytesIO(blob))
        names = tf.getnames()
        assert names == [
            f"doc{row_id}/text.txt",
            f"doc{row_id}/head.bin",
            f"doc{row_id}/meta.txt",
        ]
        assert tf.extractfile(names[0]).read() == payload
        assert tf.extractfile(names[2]).read() == str(row_id).encode()
        head = tf.extractfile(names[1]).read()
        assert len(head) == TAR_HEAD_BYTES


def test_member_stats_match_formulas():
    payload = bytes(range(200))
    enc = _encode([payload], [42])
    out = _decode(list(enc["tar"]), [42]).sort_values("member_idx")
    t = np.frombuffer(payload, np.uint8).astype(np.int64)
    head = np.resize(t, TAR_HEAD_BYTES)
    assert list(out.n_bytes) == [200, TAR_HEAD_BYTES, 2]
    assert list(out.sum_bytes) == [
        int(t.sum()),
        int(head.sum()),
        ord("4") + ord("2"),
    ]


def test_checksum_verification():
    """Corrupting one header byte must fail the checksum, not silently
    parse."""
    enc = _encode([b"abc"], [1])
    blob = bytearray(enc["tar"][0])
    blob[0] ^= 0x01  # first byte of the first member name
    with pytest.raises(ValueError, match="checksum mismatch"):
        _decode([bytes(blob)])


def test_end_marker_and_truncation():
    enc = _encode([b"abc"], [1])
    good = bytes(enc["tar"][0])
    with pytest.raises(ValueError, match="truncated tar"):
        _decode([good[:700]])
    # drop the second end block
    with pytest.raises(ValueError, match="second end block"):
        _decode([good[:-512]])
    # non-ustar magic
    bad = bytearray(good)
    bad[257:263] = b"gnutar"
    with pytest.raises(ValueError, match="not a ustar"):
        _decode([bytes(bad)])


def test_stdlib_written_tar_is_accepted():
    """The parser must also read archives produced by the stdlib
    writer (ustar format), not just its own twin."""
    buf = io.BytesIO()
    tf = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
    data = b"from the stdlib writer"
    info = tarfile.TarInfo("doc9/text.txt")
    info.size = len(data)
    info.mtime = 0
    tf.addfile(info, io.BytesIO(data))
    tf.close()
    out = _decode([buf.getvalue()])
    assert list(out.name) == ["doc9/text.txt"]
    assert out.n_bytes[0] == len(data)
    assert out.sum_bytes[0] == sum(data)


def test_empty_batch_yields_typed_empty_frame():
    out = _decode([])
    assert len(out) == 0
    assert list(out.columns) == [
        "doc_id",
        "member_idx",
        "name",
        "n_bytes",
        "sum_bytes",
    ]
