"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is a clearly-marked STUB (no image/audio libraries in this
container): a deterministic fake that derives metadata from the bytes. The
Spark-side plumbing — schema, batch iteration, partitioning, UDF signature —
is real and is what the operator actually exercises. Swap ``_decode_stub``
for a real decoder (PIL/ffmpeg) in production.

Oracle: rows-only (the decode is engine-internal, not SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}  # intentionally empty: rows-only checks


OUT_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "feat array<float>"
)


def _decode_stub(payload: bytes) -> dict:
    """STUB decode: deterministic fake metadata/features from raw bytes.
    A real implementation would raise NotImplementedError without the
    codec libs; here we fake deterministically so the plumbing is testable.
    """
    n = len(payload)
    width = (n % 64) + 1
    height = (n % 48) + 1
    # 4 fake features: byte-derived, stable across runs
    feat = [float(payload[i % n]) / 255.0 if n else 0.0 for i in range(4)]
    return {"n_bytes": n, "width": width, "height": height, "feat": feat}


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode: Arrow batches in, Arrow batches out — the
    vectorized shape a real decoder plugs into (one python worker per
    partition, zero per-row serde)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[payload_col].map(_decode_stub)
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
    decoded through the real mapInPandas pipeline."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    # The driver's rows-only canonicalizer sorts values in pandas, which
    # cannot hash list cells — stringify the feature vector for the contract
    # row; decode_media itself keeps the real array<float> column.
    return decode_media(media).withColumn(
        "feat", F.col("feat").cast("string")
    )


QUERIES["mm_decode_stub"] = mm_decode_stub
