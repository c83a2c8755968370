"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is a clearly-marked STUB (no image/audio libraries in this
container): a deterministic fake that derives metadata from the bytes. The
Spark-side plumbing — schema, batch iteration, partitioning, UDF signature —
is real and is what the operator actually exercises. Swap ``_decode_stub``
for a real decoder (PIL/ffmpeg) in production.

Oracles: ALL four ops are fully oracled — the fake decode is a
deterministic integer function of the payload byte length, so DuckDB
recomputes the exact rows and the driver hash-checks them
(``mm_decode_stub`` projects the feature vector as integer columns for the
contract row; ``decode_media`` itself keeps the ``array<float>``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


OUT_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "feat array<float>"
)


# the stub's fake-feature moduli: coprime so the 4 features differ; an
# exact integer function of byte length means a SQL oracle can recompute
# the decode (a real decoder's features are content-derived — the stub
# only needs determinism + the right shape)
_FEAT_MODS = (251, 241, 239, 233)


def _decode_stub(payload: bytes) -> dict:
    """STUB decode: deterministic fake metadata/features from raw bytes.
    A real implementation would raise NotImplementedError without the
    codec libs; here we fake deterministically so the plumbing is testable.
    """
    n = len(payload)
    width = (n % 64) + 1
    height = (n % 48) + 1
    # 4 fake features: length-derived, stable across runs, exactly
    # recomputable by the DuckDB oracle from octet_length alone
    feat = [float(n % m) / 255.0 for m in _FEAT_MODS]
    return {"n_bytes": n, "width": width, "height": height, "feat": feat}


def decode_ppm(payload: bytes) -> dict | None:
    """Pure-Python decoder for binary PPM (P6) images: header gives
    width/height; features are the mean R/G/B of the raster plus fill
    ratio. A REAL codec (bytes → pixels), not a stub — PPM needs no
    external library, so the mapInPandas path is exercised on real pixel
    data even in this container."""
    if not payload.startswith(b"P6"):
        return None
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster.
    # A payload that merely STARTS with the magic can still be truncated
    # or garbage — any malformed header returns None so decode_basic falls
    # through to the next codec / the stub instead of crashing the whole
    # mapInPandas decode job on one bad row.
    try:
        fields, i = [], 2
        while len(fields) < 3 and i < len(payload):
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment line
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        i += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if w <= 0 or h <= 0 or maxval <= 0:
            return None
    except (ValueError, IndexError):
        return None
    raster = payload[i : i + 3 * w * h]
    n_px = max(1, len(raster) // 3)
    sums = [0, 0, 0]
    lit = 0
    for p in range(n_px):
        r, g, b = raster[3 * p], raster[3 * p + 1], raster[3 * p + 2]
        sums[0] += r
        sums[1] += g
        sums[2] += b
        lit += (r + g + b) > 0
    feat = [s / n_px / maxval for s in sums] + [lit / n_px]
    return {"n_bytes": len(payload), "width": w, "height": h, "feat": feat}


def decode_wav(payload: bytes) -> dict | None:
    """Pure-Python decoder for RIFF/WAVE headers: channels and sample rate
    from the fmt chunk (reported as width/height — the schema's two int
    slots), features = [channels, sample_rate/1000, bits, data_seconds]."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    # malformed/truncated chunks degrade to zeros (slicing past the end
    # yields b"" and int.from_bytes(b"") == 0) — never a crash; a zero
    # rate/bits just produces the max(1, …) fallbacks below
    i = 12
    channels = rate = bits = data_len = 0
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        sz = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            channels = int.from_bytes(payload[i + 10 : i + 12], "little")
            rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            bits = int.from_bytes(payload[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_len = sz
        i += 8 + sz + (sz & 1)
    bytes_per_sec = max(1, rate * channels * max(1, bits // 8))
    feat = [float(channels), rate / 1000.0, float(bits), data_len / bytes_per_sec]
    return {"n_bytes": len(payload), "width": channels, "height": rate, "feat": feat}


def decode_basic(payload: bytes) -> dict:
    """Pluggable default REAL decoder: magic-byte dispatch to the pure-
    Python codecs (PPM image, WAV audio), falling back to the deterministic
    stub for formats that need external libraries (JPEG/PNG/MP3 — absent in
    this container; plug a PIL/ffmpeg-backed callable in production)."""
    return decode_ppm(payload) or decode_wav(payload) or _decode_stub(payload)


def decode_media(df: DataFrame, payload_col: str = "payload", decoder=None) -> DataFrame:
    """mapInPandas decode: Arrow batches in, Arrow batches out — the
    vectorized shape a real decoder plugs into (one python worker per
    partition, zero per-row serde). ``decoder`` is any
    ``bytes -> {n_bytes, width, height, feat}`` callable — the pluggable
    codec interface; defaults to the deterministic stub (the driver
    contract's rows-only op), with ``decode_basic`` as a real-bytes
    implementation for PPM/WAV."""
    decoder = decoder or _decode_stub

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[payload_col].map(decoder)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": meta.map(lambda m: m["n_bytes"]),
                    "width": meta.map(lambda m: m["width"]),
                    "height": meta.map(lambda m: m["height"]),
                    "feat": meta.map(lambda m: m["feat"]),
                }
            )

    return df.mapInPandas(decode, OUT_SCHEMA)


def mm_decode_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Fake media table from documents (text bytes as the opaque payload),
    decoded through the real mapInPandas pipeline. The contract row
    projects the feature vector back to its integer form (feat[i]*255 ==
    n_bytes % mod_i exactly — float32 holds values ≤ 250/255 to ~1e-7, so
    the round is lossless), giving the driver a float-format-free hash."""
    decoded = decode_media(_media(spark, sf))
    return decoded.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        *[
            F.round(F.element_at("feat", i + 1) * 255).cast("int").alias(f"f{i}")
            for i in range(4)
        ],
    )


QUERIES["mm_decode_stub"] = mm_decode_stub


# ---------------------------------------------------------------------------
# Fully-oracled plumbing ops: the fake decode is a DETERMINISTIC integer
# function of the payload byte length, so DuckDB can recompute the exact
# output — upgrading these from rows-only to hash-checked rows. The Spark
# side still runs the real Arrow/mapInPandas pipeline (the thing under
# test); only the codec call inside is fake.
# ---------------------------------------------------------------------------

_MEDIA_TYPE_SQL = "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END"


def _media(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def mm_resize_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Thumbnail-fit resize planning (≙ image resize preprocessing): fake
    dims from the decode stub, integer best-fit into a 32×32 box. The
    arithmetic runs inside mapInPandas on the decoded batch — where a real
    resize would."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            w = (n % 64) + 1
            h = (n % 48) + 1
            longest = w.combine(h, max)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": w,
                    "height": h,
                    "out_w": (w * 32 // longest).clip(lower=1),
                    "out_h": (h * 32 // longest).clip(lower=1),
                }
            )
            yield out

    return _media(spark, sf).mapInPandas(
        resize,
        "doc_id long, media_type string, width long, height long, out_w long, out_h long",
    )


def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame sampling plumbing: each doc yields (n_bytes % 7) + 1
    evenly-spaced frames; mapInPandas explodes one input row into n output
    rows — the batch-shape a real ffmpeg frame sampler produces."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            nf = (n % 7) + 1
            rep = pdf.loc[pdf.index.repeat(nf)]
            n_rep = rep["payload"].map(len)
            nf_rep = (n_rep % 7) + 1
            idx = rep.groupby(level=0).cumcount()
            yield pd.DataFrame(
                {
                    "doc_id": rep["doc_id"],
                    "frame_idx": idx,
                    "frame_offset": idx * (n_rep // nf_rep),
                }
            )

    return _media(spark, sf).mapInPandas(
        frames, "doc_id long, frame_idx long, frame_offset long"
    )


def mm_audio_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Audio chunking plumbing: fixed 256-byte windows with a short tail
    chunk — (doc_id, chunk_idx, chunk_start, chunk_len) per window."""
    CH = 256

    def chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            nc = (n + CH - 1) // CH
            rep = pdf.loc[pdf.index.repeat(nc)]
            n_rep = rep["payload"].map(len)
            idx = rep.groupby(level=0).cumcount()
            start = idx * CH
            yield pd.DataFrame(
                {
                    "doc_id": rep["doc_id"],
                    "chunk_idx": idx,
                    "chunk_start": start,
                    "chunk_len": (n_rep - start).clip(upper=CH),
                }
            )

    return _media(spark, sf).mapInPandas(
        chunks, "doc_id long, chunk_idx long, chunk_start long, chunk_len long"
    )


QUERIES["mm_resize_meta"] = mm_resize_meta
QUERIES["mm_frame_sample"] = mm_frame_sample
QUERIES["mm_audio_chunks"] = mm_audio_chunks

ORACLES["mm_decode_stub"] = f"""
WITH m AS (
  SELECT doc_id, {_MEDIA_TYPE_SQL} AS media_type,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id, media_type, n AS n_bytes,
       (n % 64) + 1 AS width,
       (n % 48) + 1 AS height,
       n % 251 AS f0, n % 241 AS f1, n % 239 AS f2, n % 233 AS f3
FROM m
"""

ORACLES["mm_resize_meta"] = f"""
WITH m AS (
  SELECT doc_id, {_MEDIA_TYPE_SQL} AS media_type,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id, media_type,
       (n % 64) + 1 AS width,
       (n % 48) + 1 AS height,
       GREATEST(1, ((n % 64) + 1) * 32 // GREATEST((n % 64) + 1, (n % 48) + 1)) AS out_w,
       GREATEST(1, ((n % 48) + 1) * 32 // GREATEST((n % 64) + 1, (n % 48) + 1)) AS out_h
FROM m
"""

ORACLES["mm_frame_sample"] = """
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS n,
         (octet_length(encode(text)) % 7) + 1 AS nf
  FROM documents
)
SELECT doc_id,
       unnest(generate_series(0, nf - 1)) AS frame_idx,
       unnest(generate_series(0, nf - 1)) * (n // nf) AS frame_offset
FROM m
"""

ORACLES["mm_audio_chunks"] = """
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS n,
         (octet_length(encode(text)) + 255) // 256 AS nc
  FROM documents
)
SELECT doc_id,
       unnest(generate_series(0, nc - 1)) AS chunk_idx,
       unnest(generate_series(0, nc - 1)) * 256 AS chunk_start,
       LEAST(n - unnest(generate_series(0, nc - 1)) * 256, 256) AS chunk_len
FROM m
"""
