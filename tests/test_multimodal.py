"""Multimodal decode plumbing: the pluggable codec interface behind
``decode_media`` exercised on REAL bytes (pure-Python PPM and WAV codecs —
no external media library needed), through the actual Arrow/mapInPandas
pipeline, plus the magic-byte dispatch fallback to the deterministic stub."""

import struct

from dibbs_ecr_refiner_spark.queries.multimodal import (
    _decode_stub,
    decode_basic,
    decode_media,
    decode_ppm,
    decode_wav,
)


def _ppm(w, h, rgb):
    """A real binary PPM (P6) image: every pixel = the given rgb triple."""
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)


def _wav(channels=2, rate=16000, bits=16, n_samples=8000):
    """A real RIFF/WAVE file: fmt chunk + silent data chunk."""
    data = b"\x00" * (n_samples * channels * (bits // 8))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8, channels * bits // 8, bits
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_ppm_codec_parses_real_pixels():
    img = _ppm(4, 3, (255, 0, 128))
    m = decode_ppm(img)
    assert (m["width"], m["height"]) == (4, 3)
    assert m["n_bytes"] == len(img)
    r, g, b, fill = m["feat"]
    assert abs(r - 1.0) < 1e-9 and g == 0.0 and abs(b - 128 / 255) < 1e-9
    assert fill == 1.0  # every pixel lit
    # all-black image: zero fill
    assert decode_ppm(_ppm(2, 2, (0, 0, 0)))["feat"][3] == 0.0


def test_wav_codec_parses_real_header():
    wav = _wav(channels=2, rate=16000, bits=16, n_samples=8000)
    m = decode_wav(wav)
    assert (m["width"], m["height"]) == (2, 16000)  # channels, sample rate
    ch, khz, bits, secs = m["feat"]
    assert (ch, khz, bits) == (2.0, 16.0, 16.0)
    assert abs(secs - 0.5) < 1e-9  # 8000 samples at 16 kHz


def test_decode_media_runs_real_codecs_through_mapinpandas(spark):
    """The full Spark path on real bytes: three payloads (PPM, WAV, and an
    unknown format that falls back to the stub) go through Arrow batches
    and come back with codec-derived metadata."""
    rows = [
        (1, "image", _ppm(6, 2, (10, 20, 30))),
        (2, "audio", _wav(channels=1, rate=8000, bits=8, n_samples=4000)),
        (3, "video", b"\x00\x01unknown-container-format\x02"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {r["doc_id"]: r for r in decode_media(df, decoder=decode_basic).collect()}

    assert (got[1]["width"], got[1]["height"]) == (6, 2)
    assert abs(got[1]["feat"][0] - 10 / 255) < 1e-6

    assert (got[2]["width"], got[2]["height"]) == (1, 8000)
    assert abs(got[2]["feat"][3] - 0.5) < 1e-6  # 4000 samples at 8 kHz

    # unknown container: stub fallback, deterministic from the bytes
    stub = _decode_stub(rows[2][2])
    assert (got[3]["width"], got[3]["height"]) == (stub["width"], stub["height"])
    assert got[3]["n_bytes"] == len(rows[2][2])


def test_decode_media_default_remains_stub(spark):
    """The driver contract's rows-only op keeps the stub default — the
    pluggable decoder changes nothing unless injected."""
    df = spark.createDataFrame(
        [(1, "image", b"P6\n1 1\n255\n\xff\xff\xff")],
        "doc_id long, media_type string, payload binary",
    )
    got = decode_media(df).collect()[0]
    stub = _decode_stub(b"P6\n1 1\n255\n\xff\xff\xff")
    # the stub does NOT understand PPM — proving the default is unchanged
    assert (got["width"], got["height"]) == (stub["width"], stub["height"]) != (1, 1)


def test_malformed_magic_payloads_fall_through_to_the_stub():
    """A payload that starts with a codec's magic but carries a truncated
    or garbage header must return None from the codec (so decode_basic
    falls through to the stub) — not crash the whole mapInPandas decode
    job on one bad row."""
    from dibbs_ecr_refiner_spark.queries.multimodal import _decode_stub, decode_wav

    bad = [
        b"P6",  # magic only
        b"P6 12",  # truncated header (one field)
        b"P6  \n# comment only",  # comment, no fields
        b"P6 0 0 255 ",  # zero dimensions
        b"P6 x y z ",  # non-numeric fields
        b"P6 3 2 0 \x00\x00",  # maxval 0 (division guard)
        b"RIFF\x00\x00\x00\x00WAVE",  # WAV with no chunks
        b"RIFF\x04\x00\x00\x00WAVEfmt ",  # truncated fmt chunk
    ]
    for payload in bad:
        got = decode_basic(payload)
        assert got is not None and got["n_bytes"] == len(payload)
        if payload.startswith(b"P6"):
            assert decode_ppm(payload) is None, payload
            assert got == _decode_stub(payload)
        else:
            # WAV header-only payloads parse to zeros, never crash
            assert decode_wav(payload) is not None or got == _decode_stub(payload)
