"""Optional native decode backends for the codec family.

The stdlib kernels in :mod:`multimodal` / :mod:`codecs` are the
dependency-free DEFAULT — they run anywhere and are the oracle-checked
path. At 100 TB the per-core cost of the Python-bound decoders (JPEG
Huffman above all) is paid back by dispatching the same
``mapInPandas`` seam to a C-backed implementation where one is
importable on the executors:

====== ============================ ==========================
format native implementation        availability
====== ============================ ==========================
wav    stdlib ``wave`` module       always (CPython stdlib)
mulaw  stdlib ``audioop.ulaw2lin``  CPython <= 3.12 (C G.711)
jpeg   Pillow                       when installed
png    Pillow                       when installed
ppm    Pillow                       when installed
gif    Pillow                       when installed
tga    Pillow                       when installed
====== ============================ ==========================

PNG additionally has ``backend="numpy"`` — a batch-vectorized
unfilter kernel (:func:`numpy_png_decode_fn`) that needs only numpy,
so an image-codec non-stdlib leg is exercisable and measurable even
in containers without Pillow (r13 verdict item 3).

Every ``decode_*`` query takes ``backend=`` — ``"stdlib"``,
``"native"``, ``"numpy"`` (where a kernel exists), or ``"auto"`` (the
default: honors the ``SMRR_CODEC_BACKEND`` env var, else stdlib).
``"native"``/``"numpy"`` fail at PLAN TIME with a clear error when the
implementation is missing; they never silently fall back, so a
benchmark that asked for a specific path cannot quietly measure the
Python one. ``"auto"`` is the silent-fallback mode: unavailable
native/numpy → stdlib.

The contract, pinned by tests/test_codec_backends.py: both backends
produce IDENTICAL rows on the valid corpus (the oracle hash therefore
holds under either), and the native/stdlib pair double-checks each
other — e.g. our G.711 expansion table equals CPython's C table on all
256 codewords.

Plan shape is unchanged: zero-exchange map-only, Arrow-batched; only
the per-row Python inside the kernel changes.
"""

from __future__ import annotations

import importlib.util
import os
from typing import Iterator

import pandas as pd

ENV_VAR = "SMRR_CODEC_BACKEND"

# formats whose native implementation is the CPython stdlib (always
# importable here) vs Pillow (optional)
_STDLIB_NATIVE = {"wav", "mulaw"}
_PIL_FORMATS = {"jpeg", "png", "ppm", "gif", "tga"}
# formats with a numpy-vectorized kernel (backend="numpy"): same
# mapInPandas seam, the per-row work batched across the Arrow batch
_NUMPY_FORMATS = {"png"}


def numpy_backend_available(fmt: str) -> bool:
    return fmt in _NUMPY_FORMATS and importlib.util.find_spec("numpy") is not None


def native_available(fmt: str) -> bool:
    """Driver-side availability probe (executors are assumed to match
    the driver's site-packages in this single-machine deployment; on a
    real cluster ship the same image to both)."""
    if fmt == "wav":
        return importlib.util.find_spec("wave") is not None
    if fmt == "mulaw":
        return importlib.util.find_spec("audioop") is not None
    if fmt in _PIL_FORMATS:
        return importlib.util.find_spec("PIL") is not None
    return False


def resolve_backend(fmt: str, backend: str) -> str:
    """'auto'/'stdlib'/'native' -> 'stdlib' | 'native', erroring at plan
    time for an explicit 'native' request that cannot be served."""
    if backend == "auto":
        backend = os.environ.get(ENV_VAR, "stdlib")
        if backend == "native" and not native_available(fmt):
            return "stdlib"  # auto degrades silently; explicit does not
        if backend == "numpy" and not numpy_backend_available(fmt):
            return "stdlib"
    if backend == "stdlib":
        return "stdlib"
    if backend == "numpy":
        if not numpy_backend_available(fmt):
            raise ValueError(
                f"numpy backend exists only for {sorted(_NUMPY_FORMATS)} "
                f"(and needs numpy importable); {fmt!r} has none — use "
                "backend='stdlib' or 'native'"
            )
        return "numpy"
    if backend == "native":
        if not native_available(fmt):
            raise ValueError(
                f"native backend for {fmt!r} requires "
                + ("Pillow" if fmt in _PIL_FORMATS else "the CPython stdlib module")
                + " on driver and executors; install it or use backend='stdlib'"
            )
        return "native"
    raise ValueError(
        f"unknown codec backend {backend!r} (auto|stdlib|native|numpy)"
    )


def wav_native_decode_fn():
    """PCM WAV decode via the stdlib ``wave`` module (C-backed chunk
    handling via chunk.py; an INDEPENDENT third-party RIFF parser vs
    multimodal._wav_decode_fn). Emits the same schema and the same
    truncate-toward-zero mean arithmetic."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            ids, rates, chs, frames, means, peaks = [], [], [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["wav"]):
                try:
                    w = wave.open(io.BytesIO(bytes(blob)))
                    if w.getsampwidth() != 2:
                        raise ValueError("want 16-bit PCM")
                    ch = w.getnchannels()
                    s = np.frombuffer(
                        w.readframes(w.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                except wave.Error as e:  # normalize to the kernel contract
                    raise ValueError(f"wave rejected payload: {e}") from e
                ids.append(doc_id)
                rates.append(w.getframerate())
                chs.append(ch)
                frames.append(len(s) // ch)
                tot = int(s.sum()) * 1000
                q = abs(tot) // s.size if s.size else 0
                means.append(-q if tot < 0 else q)
                peaks.append(int(s.max()) if s.size else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int64"),
                    "channels": pd.Series(chs, dtype="int64"),
                    "n_frames": pd.Series(frames, dtype="int64"),
                    "mean_milli": pd.Series(means, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int64"),
                }
            )

    return decode


def pil_image_decode_fn(fmt: str, in_col: str):
    """Pillow-backed decode kernel for one image format, emitting the
    SAME schema/stats as the corresponding stdlib kernel. Pillow imports
    inside the closure on the executor (mirrors
    multimodal.decode_image_pil). GIF keeps 'P' mode so raw palette
    indexes feed mean_idx_milli before the RGB conversion."""
    assert fmt in _PIL_FORMATS, fmt

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np
        from PIL import Image

        def rgb_stats(im) -> tuple[int, int, "np.ndarray"]:
            arr = np.asarray(im.convert("RGB"), dtype=np.int64)
            h, w = arr.shape[:2]
            return w, h, arr.reshape(-1, 3).sum(axis=0) * 1000 // (w * h)

        for pdf in batches:
            rows: list[dict] = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[in_col]):
                with Image.open(io.BytesIO(bytes(blob))) as im:
                    if fmt == "jpeg":
                        arr = np.asarray(im.convert("L"), dtype=np.int64)
                        h, w = arr.shape
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "width": w,
                                "height": h,
                                "mean_gray_milli": int(arr.sum()) * 1000 // (w * h),
                                "max_gray": int(arr.max()),
                                "min_gray": int(arr.min()),
                            }
                        )
                    elif fmt == "gif":
                        idx = np.asarray(im, dtype=np.int64)  # 'P' indexes
                        h, w = idx.shape
                        _, _, sums = rgb_stats(im)
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "width": w,
                                "height": h,
                                "mean_idx_milli": int(idx.sum()) * 1000 // (w * h),
                                "mean_r_milli": int(sums[0]),
                                "mean_g_milli": int(sums[1]),
                                "mean_b_milli": int(sums[2]),
                            }
                        )
                    else:  # png / ppm / tga: RGB channel means
                        w, h, sums = rgb_stats(im)
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "width": w,
                                "height": h,
                                "mean_r_milli": int(sums[0]),
                                "mean_g_milli": int(sums[1]),
                                "mean_b_milli": int(sums[2]),
                            }
                        )
            yield pd.DataFrame(rows).astype("int64")

    return decode


def numpy_png_decode_fn():
    """Batch-vectorized PNG decode (r13 verdict item 3): the first
    image-codec leg exercisable in a container without Pillow, since
    numpy is a baked-in public dependency.

    Why it's faster than the stdlib kernel here: the fixture images are
    tiny (w<=7, h<=6), so the stdlib kernel's several small numpy
    allocations PER SCANLINE are pure per-call overhead. This kernel
    keeps the per-image chunk walk (struct/zlib/binascii are C already,
    with the stdlib kernel's exact rejection messages) but reconstructs
    every image of an Arrow batch TOGETHER — a wavefront over scanline
    index t processes row t of all images at once:

    - filter 1 (Sub) is a per-lane ``cumsum(dtype=uint8)`` (mod-256
      wrap is the dtype's native overflow),
    - filter 2 (Up) is one batched uint8 add against the reconstructed
      previous wavefront,
    - the sequential Average/Paeth recurrences run their x-loop over
      ``(n_images, 3)`` int16 arrays — lanes are independent, so the
      only irreducibly serial axis is pixel position.

    Interpreter step count per BATCH is O(max_h * max_w) instead of
    O(h * w) per IMAGE — the same batching shape a 100 TB decode fleet
    wants, where thousands of small blobs share one Arrow batch.
    Padding lanes beyond an image's true (h, stride) carry garbage by
    construction; PNG filters are lane-local (left = same lane, up =
    same position), so real positions never read padding, and one
    final mask zeroes it before the channel sums.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import binascii
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def parse(b: bytes) -> tuple[int, int, bytes]:
            """(width, height, unfiltered scanline stream) — the same
            walk and ValueError contract as multimodal._png_decode_fn."""
            if b[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG: bad signature")
            pos, end = 8, len(b)
            ihdr = None
            idat = bytearray()
            seen_iend = False
            while pos < end:
                if pos + 8 > end:
                    raise ValueError("truncated PNG: chunk header")
                (length,) = struct.unpack(">I", b[pos : pos + 4])
                ctype = b[pos + 4 : pos + 8]
                data = b[pos + 8 : pos + 8 + length]
                if len(data) != length or pos + 12 + length > end:
                    raise ValueError("truncated PNG: chunk data")
                (crc,) = struct.unpack(
                    ">I", b[pos + 8 + length : pos + 12 + length]
                )
                if binascii.crc32(ctype + data) != crc:
                    raise ValueError(f"CRC mismatch in {ctype!r} chunk")
                if ctype == b"IHDR":
                    ihdr = struct.unpack(">IIBBBBB", data)
                elif ctype == b"IDAT":
                    idat.extend(data)
                elif ctype == b"IEND":
                    seen_iend = True
                    break
                pos += 12 + length
            if ihdr is None or not seen_iend:
                raise ValueError("PNG missing IHDR or IEND")
            w, h, depth, ctype_i, comp, filt, inter = ihdr
            if (depth, ctype_i, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG shape (want 8-bit RGB, deflate, "
                    "filter method 0, no interlace)"
                )
            want = h * (1 + w * 3)
            try:
                d = zlib.decompressobj()
                stream = d.decompress(bytes(idat), want + 1)
            except zlib.error as exc:
                raise ValueError(f"corrupt PNG deflate stream: {exc}") from exc
            if len(stream) != want or not d.eof:
                raise ValueError("PNG raster size mismatch")
            # filter types validate PER IMAGE, in scanline order, so a
            # batch mixing corrupt images raises the SAME first error
            # as the stdlib kernel (review-found: the batch-level check
            # reported a later image's structural error first)
            fb = np.frombuffer(stream, dtype=np.uint8).reshape(
                h, 1 + w * 3
            )[:, 0]
            bad = fb[fb > 4]
            if bad.size:
                raise ValueError(f"unknown PNG filter type {int(bad[0])}")
            return w, h, stream

        empty = {
            "doc_id": pd.Series([], dtype="int64"),
            "width": pd.Series([], dtype="int64"),
            "height": pd.Series([], dtype="int64"),
            "mean_r_milli": pd.Series([], dtype="int64"),
            "mean_g_milli": pd.Series([], dtype="int64"),
            "mean_b_milli": pd.Series([], dtype="int64"),
        }

        for pdf in batches:
            metas = [
                (doc_id,) + parse(bytes(blob))
                for doc_id, blob in zip(pdf["doc_id"], pdf["png"])
            ]
            if not metas:
                yield pd.DataFrame(empty)
                continue
            n = len(metas)
            ws = np.array([m[1] for m in metas], dtype=np.int64)
            hs = np.array([m[2] for m in metas], dtype=np.int64)
            strides = ws * 3
            mh, ms = int(hs.max()), int(strides.max())
            mw = ms // 3
            ftypes = np.full((n, mh), -1, dtype=np.int16)
            filt = np.zeros((n, mh, ms), dtype=np.uint8)
            for i, (_, w, h, stream) in enumerate(metas):
                arr = np.frombuffer(stream, dtype=np.uint8).reshape(
                    h, 1 + 3 * w
                )
                ftypes[i, :h] = arr[:, 0]
                filt[i, :h, : 3 * w] = arr[:, 1:]
            row_mask = np.arange(mh)[None, :] < hs[:, None]
            # filter types already validated per image inside parse()
            recon = np.zeros((n, mh, ms), dtype=np.uint8)
            prev = np.zeros((n, ms), dtype=np.uint8)
            for t in range(mh):
                ft = ftypes[:, t]
                m0 = ft == 0  # padding rows (-1) fall through untouched
                if m0.any():
                    recon[m0, t] = filt[m0, t]
                m1 = ft == 1
                if m1.any():
                    k = int(m1.sum())
                    recon[m1, t] = np.cumsum(
                        filt[m1, t].reshape(k, mw, 3), axis=1, dtype=np.uint8
                    ).reshape(k, ms)
                m2 = ft == 2
                if m2.any():
                    recon[m2, t] = filt[m2, t] + prev[m2]
                for f in (3, 4):
                    mk = ft == f
                    if not mk.any():
                        continue
                    xk = filt[mk, t].astype(np.int16).reshape(-1, mw, 3)
                    up = prev[mk].astype(np.int16).reshape(-1, mw, 3)
                    out = np.empty_like(xk)
                    a = np.zeros((xk.shape[0], 3), dtype=np.int16)
                    c = np.zeros_like(a)
                    for x in range(mw):
                        b = up[:, x]
                        if f == 3:  # Average
                            a = (xk[:, x] + ((a + b) >> 1)) & 255
                        else:  # Paeth
                            p = a + b - c
                            pa = np.abs(p - a)
                            pb = np.abs(p - b)
                            pc = np.abs(p - c)
                            pred = np.where(
                                (pa <= pb) & (pa <= pc),
                                a,
                                np.where(pb <= pc, b, c),
                            )
                            a = (xk[:, x] + pred) & 255
                            c = b
                        out[:, x] = a
                    recon[mk, t] = out.reshape(out.shape[0], ms).astype(
                        np.uint8
                    )
                prev = recon[:, t]
            lane_mask = np.arange(ms)[None, :] < strides[:, None]
            px = (
                recon.astype(np.int64)
                * lane_mask[:, None, :]
                * row_mask[:, :, None]
            )
            sums = px.reshape(n, mh, mw, 3).sum(axis=(1, 2))
            means = sums * 1000 // (ws * hs)[:, None]
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(
                        [m[0] for m in metas], dtype="int64"
                    ),
                    "width": ws,
                    "height": hs,
                    "mean_r_milli": means[:, 0],
                    "mean_g_milli": means[:, 1],
                    "mean_b_milli": means[:, 2],
                }
            )

    return decode
