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

Every ``decode_*`` query takes ``backend=`` — ``"stdlib"``,
``"native"``, or ``"auto"`` (the default: honors the
``SMRR_CODEC_BACKEND`` env var, else stdlib). ``"native"`` fails at
PLAN TIME with a clear error when the implementation is missing; it
never silently falls back, so a benchmark that asked for the native
path cannot quietly measure the Python one. ``"auto"`` is the silent-
fallback mode: unavailable native → stdlib.

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
    if backend == "stdlib":
        return "stdlib"
    if backend == "native":
        if not native_available(fmt):
            raise ValueError(
                f"native backend for {fmt!r} requires "
                + ("Pillow" if fmt in _PIL_FORMATS else "the CPython stdlib module")
                + " on driver and executors; install it or use backend='stdlib'"
            )
        return "native"
    raise ValueError(f"unknown codec backend {backend!r} (auto|stdlib|native)")


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
