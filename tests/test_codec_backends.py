"""Native-backend seam for the decode family (r13 verdict item 4).

Contract: ``backend='native'`` dispatches the SAME mapInPandas seam to a
C-backed decoder and produces IDENTICAL rows to the stdlib kernel on the
valid corpus — so every oracle row stays green under either backend. The
exercisable native legs in this container are the CPython stdlib ``wave``
module (an independent third-party RIFF parser) and ``audioop.ulaw2lin``
(the C G.711 expansion); the Pillow legs are import-gated and skip when
Pillow is absent.
"""

from __future__ import annotations

import pytest

from simple_map_reduce_ruuner_spark.operators import codec_backends


def _pil() -> bool:
    return codec_backends.native_available("jpeg")


def test_g711_expansion_matches_cpython_c_table():
    """Our vectorized G.711 table vs CPython's C implementation, all 256
    codewords — two independent derivations of the CCITT expansion."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    u = 255 - np.arange(256, dtype=np.int64)
    t = ((u & 15) * 8 + 132) << ((u >> 4) & 7)
    ours = np.where(u >= 128, 132 - t, t - 132)
    theirs = np.frombuffer(
        audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2"
    ).astype(np.int64)
    assert (ours == theirs).all()


def test_wav_backends_identical(spark, sf_dir):
    from simple_map_reduce_ruuner_spark.operators.multimodal import decode_audio_wav

    std = sorted(map(tuple, decode_audio_wav(spark, sf_dir, backend="stdlib").collect()))
    nat = sorted(map(tuple, decode_audio_wav(spark, sf_dir, backend="native").collect()))
    assert std and std == nat


def test_mulaw_backends_identical(spark, sf_dir):
    from simple_map_reduce_ruuner_spark.operators.codecs import decode_audio_mulaw

    std = sorted(
        map(tuple, decode_audio_mulaw(spark, sf_dir, backend="stdlib").collect())
    )
    nat = sorted(
        map(tuple, decode_audio_mulaw(spark, sf_dir, backend="native").collect())
    )
    assert std and std == nat


@pytest.mark.skipif(not _pil(), reason="Pillow not installed")
@pytest.mark.parametrize("fmt", ["jpeg", "png", "ppm", "gif", "tga"])
def test_pil_backends_identical(spark, sf_dir, fmt):
    from simple_map_reduce_ruuner_spark.operators import codecs, multimodal

    fn = {
        "jpeg": codecs.decode_image_jpeg,
        "png": multimodal.decode_image_png,
        "ppm": multimodal.decode_image_ppm,
        "gif": codecs.decode_image_gif,
        "tga": codecs.decode_image_tga,
    }[fmt]
    std = sorted(map(tuple, fn(spark, sf_dir, backend="stdlib").collect()))
    nat = sorted(map(tuple, fn(spark, sf_dir, backend="native").collect()))
    assert std and std == nat


@pytest.mark.skipif(_pil(), reason="Pillow installed: native path active")
def test_explicit_native_image_backend_errors_clearly(spark, sf_dir):
    """An EXPLICIT native request never silently falls back — a benchmark
    that asked for the native path must not quietly measure Python."""
    from simple_map_reduce_ruuner_spark.operators.codecs import decode_image_jpeg

    with pytest.raises(ValueError, match="Pillow"):
        decode_image_jpeg(spark, sf_dir, backend="native")


def test_auto_honors_env_var(spark, sf_dir, monkeypatch):
    """auto resolves the env var; native-unavailable degrades to stdlib
    silently (auto is the fallback mode, explicit is not)."""
    monkeypatch.setenv(codec_backends.ENV_VAR, "native")
    assert codec_backends.resolve_backend("wav", "auto") == "native"
    if not _pil():
        assert codec_backends.resolve_backend("jpeg", "auto") == "stdlib"
    monkeypatch.delenv(codec_backends.ENV_VAR)
    assert codec_backends.resolve_backend("wav", "auto") == "stdlib"
    with pytest.raises(ValueError, match="auto\\|stdlib\\|native"):
        codec_backends.resolve_backend("wav", "fast")


def test_numpy_png_backend_identical_rows(spark, sf_dir):
    """The batch-vectorized numpy unfilter (r13 verdict item 3) must be
    byte-identical to the stdlib scanline kernel on the real corpus —
    every oracle row stays green under either backend."""
    from simple_map_reduce_ruuner_spark.operators.multimodal import (
        decode_image_png,
    )

    std = sorted(
        map(tuple, decode_image_png(spark, sf_dir, backend="stdlib").collect())
    )
    vec = sorted(
        map(tuple, decode_image_png(spark, sf_dir, backend="numpy").collect())
    )
    assert std and std == vec


def test_numpy_png_kernel_all_filters_and_rejections():
    """Local differential over synthetic payloads wide enough that every
    (w, h) combination — hence all five scanline filters, including
    Paeth rows — appears; plus the rejection contract (ValueError, same
    messages as the stdlib kernel) and the empty-batch shape."""
    import numpy as np
    import pandas as pd

    from simple_map_reduce_ruuner_spark.operators.multimodal import (
        _png_decode_fn,
        _png_encode_fn,
    )

    n = 300  # doc_id spans 30 (w,h) combos x10
    rng = np.random.default_rng(11)
    payloads = [
        rng.integers(0, 256, size=int(rng.integers(1, 300)), dtype=np.uint8)
        .tobytes()
        for _ in range(n)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(n, dtype="int64"), "payload": payloads}
    )
    enc = pd.concat(list(_png_encode_fn()([pdf])), ignore_index=True)
    out_std = pd.concat(list(_png_decode_fn()([enc])), ignore_index=True)
    out_vec = pd.concat(
        list(codec_backends.numpy_png_decode_fn()([enc])), ignore_index=True
    )
    assert out_std.equals(out_vec)

    vec = codec_backends.numpy_png_decode_fn()
    with pytest.raises(ValueError, match="bad signature"):
        list(vec([pd.DataFrame({"doc_id": [1], "png": [b"nope"]})]))
    flipped = bytearray(enc["png"][0])
    flipped[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(vec([pd.DataFrame({"doc_id": [1], "png": [bytes(flipped)]})]))
    empty = pd.concat(
        list(
            vec(
                [
                    pd.DataFrame(
                        {
                            "doc_id": pd.Series([], dtype="int64"),
                            "png": pd.Series([], dtype=object),
                        }
                    )
                ]
            )
        ),
        ignore_index=True,
    )
    assert len(empty) == 0 and set(empty.dtypes) == {np.dtype("int64")}


def test_explicit_numpy_backend_errors_for_other_formats(spark, sf_dir):
    """backend='numpy' exists only where a vectorized kernel does; an
    explicit request for another format fails at plan time."""
    from simple_map_reduce_ruuner_spark.operators.codecs import (
        decode_image_jpeg,
    )

    with pytest.raises(ValueError, match="numpy backend exists only"):
        decode_image_jpeg(spark, sf_dir, backend="numpy")
    assert codec_backends.resolve_backend("png", "numpy") == "numpy"


def test_auto_env_numpy_degrades_to_stdlib_for_other_formats(monkeypatch):
    monkeypatch.setenv(codec_backends.ENV_VAR, "numpy")
    assert codec_backends.resolve_backend("png", "auto") == "numpy"
    assert codec_backends.resolve_backend("jpeg", "auto") == "stdlib"
