"""GIF89a codec kernels (codecs.decode_image_gif), driven directly
through the production factories — no Spark session needed.

The decoder must be a REAL GIF parser with a full variable-width LZW
decoder (KwKwK, late code widening, mid-stream CLEAR resets) and must
actually USE the color table — the palette is non-identity so raw
indexes hash-mismatch. Spark-level oracle parity runs in the driver
gate.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from simple_map_reduce_ruuner_spark.operators.codecs import (
    GIF_CLEAR_EVERY,
    _gif_decode_fn,
    _gif_encode_fn,
)


def _decode(blobs: list[bytes], ids: list[int] | None = None) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": ids or list(range(len(blobs))), "gif": blobs})
    return pd.concat(list(_gif_decode_fn()([pdf])), ignore_index=True)


def _encode(payloads: list[bytes], ids: list[int]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": ids, "payload": payloads})
    return pd.concat(list(_gif_encode_fn()([pdf])), ignore_index=True)


def _expected(payload: bytes, doc_id: int):
    w, h = 16 + doc_id % 17, 12 + doc_id % 13
    t = np.frombuffer(payload, np.uint8)
    idx = (np.resize(t, w * h) if t.size else np.zeros(w * h, np.uint8)).astype(
        np.int64
    )
    return w, h, idx


def test_roundtrip_and_palette_lookup():
    ids = [0, 1, 7]
    payloads = [b"hello world", b"", bytes(range(256))]
    enc = _encode(payloads, ids)
    out = _decode(list(enc["gif"]), list(enc["doc_id"]))
    for d, p in zip(ids, payloads):
        w, h, idx = _expected(p, d)
        row = out[out.doc_id == d].iloc[0]
        assert (row.width, row.height) == (w, h)
        assert row.mean_idx_milli == int(idx.sum()) * 1000 // (w * h)
        # palette-mapped channels: non-identity formulas
        r = (idx * 7 + 13) % 256
        g = (idx * 31 + 5) % 256
        b = (idx * 13 + 101) % 256
        assert row.mean_r_milli == int(r.sum()) * 1000 // (w * h)
        assert row.mean_g_milli == int(g.sum()) * 1000 // (w * h)
        assert row.mean_b_milli == int(b.sum()) * 1000 // (w * h)
        # a decoder skipping the palette would return the index mean in
        # the channel slots — assert they differ for this payload
        if p:
            assert row.mean_r_milli != row.mean_idx_milli


def test_kwkwk_runs_decode_exactly():
    """Constant pixels produce the KwKwK pattern (code == next_code)
    immediately and repeatedly."""
    enc = _encode([b"a" * 10], [0])  # every pixel = 97
    out = _decode(list(enc["gif"]), [0])
    w, h, idx = _expected(b"a" * 10, 0)
    assert out.mean_idx_milli[0] == 97_000
    assert out.mean_r_milli[0] == ((97 * 7 + 13) % 256) * 1000


def test_code_width_growth_and_midstream_clear():
    """A fully random 768-px image forces >512 table entries (10-bit
    codes) and crosses the deliberate CLEAR (every GIF_CLEAR_EVERY
    codes) — the decoder must reset and re-grow its table mid-image."""
    rng = np.random.RandomState(3)
    payload = bytes(rng.randint(0, 256, 768, dtype=np.int64).astype(np.uint8))
    # doc 220: 16+220%17=32, 12+220%13=24 -> 768 px
    enc = _encode([payload], [220])
    out = _decode(list(enc["gif"]), [220])
    w, h, idx = _expected(payload, 220)
    assert (w * h, out.width[0], out.height[0]) == (768, 32, 24)
    assert out.mean_idx_milli[0] == int(idx.sum()) * 1000 // 768
    # sanity: incompressible input must actually emit >CLEAR_EVERY codes
    assert 768 > GIF_CLEAR_EVERY


def test_parser_rejects_invalid_input():
    enc = _encode([b"abc"], [2])
    good = bytes(enc["gif"][0])
    with pytest.raises(ValueError, match="bad signature"):
        _decode([b"JIF89a" + good[6:]])
    with pytest.raises(ValueError, match="truncated GIF"):
        _decode([good[:40]])
    # the image descriptor sits after header(6) + LSD(7) + GCT(768) +
    # extensions — 0x2C bytes inside the palette must not be matched
    at = good.find(b"\x2c", 6 + 7 + 768)
    # interlace flag on the image descriptor
    bad = bytearray(good)
    bad[at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        _decode([bytes(bad)])
    # missing trailer
    with pytest.raises(ValueError, match="missing trailer"):
        _decode([good[:-1]])
    # file ending inside the image descriptor (review-found: used to
    # surface as struct.error instead of the ValueError contract)
    with pytest.raises(ValueError, match="truncated GIF"):
        _decode([good[: at + 5]])
    # corrupt a mid-stream LZW byte: must fail loudly (size mismatch,
    # overflow, or an out-of-range code), never return wrong means
    sub_at = at + 10 + 1  # first sub-block length byte
    bad = bytearray(good)
    bad[sub_at + 3] ^= 0xFF
    with pytest.raises(ValueError):
        _decode([bytes(bad)])


def test_extensions_are_skipped():
    """The encoder plants GCE + Comment extensions; parse success plus
    exact means proves the sub-block walk. Verify they are present."""
    enc = _encode([b"zz"], [4])
    blob = bytes(enc["gif"][0])
    assert b"\x21\xf9" in blob and b"\x21\xfe" in blob
    out = _decode([blob], [4])
    assert out.width[0] == 20


def test_empty_batch_yields_typed_empty_frame():
    out = _decode([])
    assert len(out) == 0
    assert list(out.columns) == [
        "doc_id",
        "width",
        "height",
        "mean_idx_milli",
        "mean_r_milli",
        "mean_g_milli",
        "mean_b_milli",
    ]
